package graft.oracle

/** LLM-backed oracle skeleton: the reference's per-judgment prompts
  * (Semantic-OLAP/Agents/Components/Operaters.py — filter_LLM:45-78,
  * sem_map:318-350, sem_group:376-397, sem_reduce:404-423,
  * sem_topk:453-494) recast over one abstract completion function.
  *
  * Subclasses implement [[complete]] (and ideally [[completeBatch]] with a
  * real batched RPC); the engine side — batching, partition-local client
  * reuse, cost-ordered cascades that shrink this oracle's input — lives in
  * [[BatchedExec]] and the operators, and is fully tested with
  * deterministic fakes. No network code here: the build environment is
  * zero-egress, and the transport is deployment-specific.
  */
abstract class PromptingOracle extends BatchedOracle {

  /** One completion. Implementations own transport, retry, and rate
    * limiting; they see already-batched traffic from [[BatchedExec]].
    */
  def complete(prompt: String): String

  /** Override with a single batched RPC where the backend supports it. */
  def completeBatch(prompts: Seq[String]): Seq[String] =
    prompts.map(complete)

  // ---- prompt shapes (mirroring the reference's judgment contracts) ----

  protected def judgePrompt(text: String, condition: String): String =
    s"""Does the following text satisfy the condition?
       |Condition: $condition
       |Text: $text
       |Answer strictly Yes or No.""".stripMargin

  protected def extractPrompt(text: String, desc: String): String =
    s"""Derive the value described below from the text.
       |Description: $desc
       |Text: $text
       |Answer with the value only, or NA if it cannot be derived.""".stripMargin

  protected def classifyPrompt(text: String, vocab: Seq[TagRule]): String =
    s"""Assign the text to one of the existing tags, or answer NA.
       |Tags: ${vocab.map(_.tag).mkString(", ")}
       |Text: $text
       |Answer with exactly one tag or NA.""".stripMargin

  protected def summarizePrompt(values: Seq[String], desc: String): String =
    s"""Summarize the following distinct values into one short phrase.
       |Focus: $desc
       |Values: ${values.mkString("; ")}""".stripMargin

  protected def duelPrompt(a: String, b: String, query: String): String =
    s"""Which text is more relevant to the query?
       |Query: $query
       |Text A: $a
       |Text B: $b
       |Answer strictly A or B.""".stripMargin

  protected def scorePrompt(text: String, query: String): String =
    s"""Rate the relevance of the text to the query from 0.0 to 1.0.
       |Query: $query
       |Text: $text
       |Answer with a single number.""".stripMargin

  // ---- SemanticOracle implementation over complete() ----

  private def yes(s: String): Boolean =
    s.trim.toLowerCase.startsWith("y")

  private def na(s: String): Option[String] = {
    val t = s.trim
    if (t.isEmpty || t.equalsIgnoreCase("na")) None else Some(t)
  }

  override def judge(text: String, condition: String): Boolean =
    yes(complete(judgePrompt(text, condition)))

  override def extract(text: String, desc: String): Option[String] =
    na(complete(extractPrompt(text, desc)))

  override def classify(text: String, vocab: Seq[TagRule]): Option[String] =
    na(complete(classifyPrompt(text, vocab)))
      .filter(t => vocab.exists(_.tag == t))

  override def summarize(values: Seq[String], desc: String): String =
    complete(summarizePrompt(values, desc)).trim

  override def duel(a: String, b: String, query: String): Boolean =
    complete(duelPrompt(a, b, query)).trim.toUpperCase.startsWith("A")

  private def parseScore(s: String): Double =
    try s.trim.toDouble match {
      // NaN parses without exception and would sort ABOVE 1.0 in a
      // descending Spark sort — treat it like any other garbage answer
      case d if d.isNaN => 0.0
      case d if d < 0 => 0.0
      case d if d > 1 => 1.0
      case d => d
    } catch { case _: NumberFormatException => 0.0 }

  override def score(text: String, query: String): Double =
    parseScore(complete(scorePrompt(text, query)))

  // batched variants route through completeBatch (one RPC per batch)

  /** Null texts never reach the LLM: the per-row UDF path short-circuits
    * null -> false/None/0.0, and the batched path must agree (same answer
    * through either routing mode, and no wasted completions). Runs the
    * batch over non-null texts only and stitches defaults back in position.
    */
  private def batchNonNull[R](texts: Seq[String], default: R)(
      run: Seq[String] => Seq[R]): Seq[R] = {
    val nonNull = texts.filter(_ != null)
    if (nonNull.isEmpty) texts.map(_ => default)
    else {
      val it = run(nonNull).iterator
      texts.map(t => if (t == null) default else it.next())
    }
  }

  override def judgeBatch(texts: Seq[String], condition: String): Seq[Boolean] =
    batchNonNull(texts, false)(ts =>
      completeBatch(ts.map(judgePrompt(_, condition))).map(yes))

  override def extractBatch(texts: Seq[String], desc: String): Seq[Option[String]] =
    batchNonNull(texts, Option.empty[String])(ts =>
      completeBatch(ts.map(extractPrompt(_, desc))).map(na))

  override def classifyBatch(texts: Seq[String],
      vocab: Seq[TagRule]): Seq[Option[String]] =
    batchNonNull(texts, Option.empty[String])(ts =>
      completeBatch(ts.map(classifyPrompt(_, vocab)))
        .map(na(_).filter(t => vocab.exists(_.tag == t))))

  override def scoreBatch(texts: Seq[String], query: String): Seq[Double] =
    batchNonNull(texts, 0.0)(ts =>
      completeBatch(ts.map(scorePrompt(_, query))).map(parseScore))

  override def duelBatch(pairs: Seq[(String, String)],
      query: String): Seq[Boolean] =
    completeBatch(pairs.map { case (a, b) =>
      duelPrompt(Option(a).getOrElse(""), Option(b).getOrElse(""), query)
    }).map(_.trim.toUpperCase.startsWith("A"))
}
