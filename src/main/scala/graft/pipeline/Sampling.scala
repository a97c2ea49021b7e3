package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling and dataset splitting.
  *
  * Training pipelines need REPRODUCIBLE row selection: the same row lands
  * in the same split on every run, every engine, and every partitioning —
  * which rules out RNG-based `sample()` (seed semantics are engine- and
  * partitioning-specific). The standard answer is a content hash of a
  * stable key: bucket = md5(key || salt) mod 100, then threshold buckets.
  * Pure codegen'd expressions — no shuffle, no state, trivially
  * embarrassingly parallel at any scale; changing `salt` draws an
  * independent re-split.
  */
object Sampling {

  /** Deterministic bucket in [0, 100): md5 over (key, salt), first 4 hex
    * chars as an integer, mod 100. Engine-portable: md5 is md5.
    */
  def hashBucket(key: Column, salt: String): Column =
    (conv(substring(md5(concat(key.cast("string"), lit(salt))), 1, 4), 16, 10)
      .cast("long") % 100).cast("int")

  /** Keep a deterministic `percent`% of rows by key hash. */
  def hashSample(df: DataFrame, keyCol: String, percent: Int,
      salt: String = "graft"): DataFrame = {
    require(percent >= 0 && percent <= 100, "percent in [0,100]")
    df.filter(hashBucket(col(keyCol), salt) < percent)
  }

  /** Assign every row a split label from cumulative percentage cuts, e.g.
    * `Seq("train" -> 80, "val" -> 10, "test" -> 10)` (must sum to 100).
    */
  def splitColumn(key: Column, cuts: Seq[(String, Int)],
      salt: String = "graft"): Column = {
    require(cuts.map(_._2).sum == 100, "split percentages must sum to 100")
    val b = hashBucket(key, salt)
    val bounds = cuts.scanLeft(0)(_ + _._2).tail
    cuts.zip(bounds).init.foldRight(lit(cuts.last._1): Column) {
      case (((name, _), hi), els) => when(b < hi, lit(name)).otherwise(els)
    }
  }

  /** Attach a `split` column (train/val/test by default). */
  def withSplit(df: DataFrame, keyCol: String,
      cuts: Seq[(String, Int)] = Seq("train" -> 80, "val" -> 10, "test" -> 10),
      salt: String = "graft"): DataFrame =
    df.withColumn("split", splitColumn(col(keyCol), cuts, salt))

  /** Deterministic STRATIFIED sample: keep `percents(stratum)`% of each
    * stratum's rows by key hash (strata absent from the map keep 0%).
    * The language-rebalancing primitive of corpus curation (downsample
    * dominant languages/sources without an RNG): same hash rule as
    * [[hashSample]], so membership is reproducible across engines and
    * independent of partitioning, and a row's fate never changes when
    * other strata's percentages do. Pure codegen — the per-stratum
    * threshold folds to one CASE expression; no shuffle, no per-stratum
    * job, no driver state.
    */
  def stratifiedSample(df: DataFrame, keyCol: String, stratumCol: String,
      percents: Map[String, Int], salt: String = "graft"): DataFrame = {
    require(percents.values.forall(p => p >= 0 && p <= 100),
      "stratum percents in [0,100]")
    val threshold = percents.toSeq.sortBy(_._1)
      .foldRight(lit(0): Column) { case ((stratum, pct), els) =>
        when(col(stratumCol) === stratum, lit(pct)).otherwise(els)
      }
    df.filter(hashBucket(col(keyCol), salt) < threshold)
  }

  /** Finer-grained deterministic bucket in [0, 10000): the same md5 rule
    * as [[hashBucket]] over the first 4 hex chars, mod 10000 — for rates
    * where 1% granularity is too coarse. Use a DIFFERENT salt than any
    * percent-level split on the same key: both rules read the same hash
    * prefix, so same-salt selections are nested, not independent.
    */
  def hashBucket10k(key: Column, salt: String): Column =
    (conv(substring(md5(concat(key.cast("string"), lit(salt))), 1, 4), 16, 10)
      .cast("long") % 10000).cast("int")

  /** Downsample strata to a TARGET MIXTURE with maximum retention — the
    * "rebalance the corpus to 40% en / 20% de / ..." pass of training-mix
    * assembly. `targetShares` are relative weights (any positive scale).
    *
    * The max-retention solution keeps every row of the BINDING stratum j
    * (the one minimizing n_i/share_i — already at or below its target
    * share) and downsamples each other stratum toward
    * n_j · share_i / share_j rows. Rates are materialized as integer
    * per-10k thresholds over the [[hashBucket10k]] rule, with the
    * threshold arithmetic in EXACT integer math
    * (⌊10000·n_j·share_i / (share_j·n_i)⌋) — reproducible on any engine,
    * achieved mix within 1/10000 per stratum of target (plus hash
    * dispersion). Strata absent from `targetShares` are dropped (share
    * 0); shares naming absent strata are unattainable and ignored.
    *
    * Scale shape: one count-by-stratum aggregate (collect bounded by the
    * stratum cardinality — languages/domains, not rows), then a pure
    * codegen filter. Deterministic: a row's fate depends only on its key,
    * the salt, and the stratum counts.
    */
  def targetMix(df: DataFrame, keyCol: String, stratumCol: String,
      targetShares: Map[String, Int], salt: String = "graft-mix")
      : DataFrame =
    targetMixLong(df, keyCol, stratumCol,
      targetShares.map { case (s, v) => s -> v.toLong }, salt)

  /** [[targetMix]] with Long shares — needed when shares are DERIVED from
    * stratum counts (e.g. [[temperatureMix]]'s ⌊√n·1000⌋): an Int share
    * saturates for strata beyond ~4.6e12 rows. Threshold arithmetic is
    * BigInt throughout, so wide shares stay exact.
    */
  def targetMixLong(df: DataFrame, keyCol: String, stratumCol: String,
      targetShares: Map[String, Long], salt: String = "graft-mix")
      : DataFrame = {
    require(targetShares.nonEmpty, "targetMix needs >= 1 stratum share")
    require(targetShares.values.forall(_ > 0),
      "shares must be positive (omit a stratum to drop it)")
    val counts = df.filter(col(stratumCol)
        .isInCollection(targetShares.keys.toSeq))
      .groupBy(stratumCol).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    require(counts.nonEmpty, "no stratum in targetShares has any rows")
    // binding stratum: min n/share as an IEEE double (exactly-rounded
    // division — portable), ties to the smaller name
    val (js, jn) = counts.toSeq
      .minBy { case (s, n) => (n.toDouble / targetShares(s), s) }
    val jShare = targetShares(js)
    val thresholds = counts.map { case (s, n) =>
      s -> (BigInt(10000) * jn * targetShares(s) / (BigInt(jShare) * n))
        .min(10000).toInt
    }
    val threshold = thresholds.toSeq.sortBy(_._1)
      .foldRight(lit(0): Column) { case ((stratum, t), els) =>
        when(col(stratumCol) === stratum, lit(t)).otherwise(els)
      }
    df.filter(hashBucket10k(col(keyCol), salt) < threshold)
  }

  /** Token-budget sequence packing: assign documents to contiguous packs
    * of ~`budget` tokens — the "fill 4k-token training sequences" pass of
    * corpus assembly. Contract: rows are ordered deterministically by
    * `orderCol` WITHIN each shard; a document starts pack p when the
    * tokens before it total in [p*budget, (p+1)*budget) — the document
    * that straddles a boundary stays whole in the pack it starts in (the
    * standard greedy-contiguous rule: packs may overrun by at most one
    * document).
    *
    * Scale: one running-sum window PARTITIONED BY the shard — packing
    * parallelism is the shard count, never a global single-partition
    * sort. Shard first (hash split, language, source file), pack within.
    */
  /** TEMPERATURE REBALANCING at α = 1/2 (the mC4/XLM-R multilingual
    * smoothing): downsample toward target shares ∝ √(n_stratum), so
    * dominant languages shrink and low-resource ones keep everything —
    * the binding (smallest-√n) stratum retains 100% and stratum i
    * lands near n_j·√(n_i)/√(n_j) rows. Built ON [[targetMix]]: shares
    * are ⌊√n·1000⌋ integers, thresholds stay exact integer math, and
    * membership stays the md5 per-10k rule.
    *
    * α is FIXED at 1/2 deliberately: `sqrt` is IEEE correctly-rounded
    * (bit-identical on every engine), so the derived integer shares —
    * and therefore every row's fate — are reproducible anywhere;
    * arbitrary-α `pow` differs across platforms by ulps, which a floor
    * at a share boundary would turn into membership drift.
    *
    * Scale shape: one count-by-stratum aggregate (bounded by stratum
    * cardinality), then a pure codegen filter — no shuffle of the data.
    */
  def temperatureMix(df: DataFrame, keyCol: String, stratumCol: String,
      salt: String = "graft-temp"): DataFrame = {
    val counts = df.filter(col(stratumCol).isNotNull)
      .groupBy(stratumCol).agg(count(lit(1)).as("n"))
      .collect().map(r => r.get(0).toString -> r.getLong(1))
    require(counts.nonEmpty, "temperatureMix needs >= 1 non-null stratum")
    // Long shares: sqrt(Long.MaxValue)*1000 ≈ 3e12 — an Int share would
    // silently saturate at ~4.6e12 rows per stratum and distort the mix.
    val shares = counts.map { case (s, n) =>
      s -> math.floor(math.sqrt(n.toDouble) * 1000).toLong
    }.toMap
    targetMixLong(df, keyCol, stratumCol, shares, salt)
  }

  /** PER-GROUP CAP — keep at most `n` rows per group, preferring the
    * HIGHEST `score`, ties broken by the SMALLEST `id` (the C4 /
    * RefinedWeb per-domain cap: no single domain may flood the corpus,
    * and when one would, its best documents survive). Null scores rank
    * last (−∞).
    *
    * NOT a corpus-wide window sort: a `row_number` over
    * `partitionBy(group)` sorts every group's FULL row set (and a
    * web-scale corpus has a domain holding percents of it). Instead:
    *   1. shuffle ONLY slim `(group, score, id)` triplets into a
    *      bounded-heap aggregator that keeps each group's n best
    *      pairs — per-group state is n pairs, never the group;
    *   2. join each group's THRESHOLD (its n-th best pair; null for
    *      under-cap groups, which keep everything) back on the group
    *      key and keep rows at-or-better than it. One row per group —
    *      broadcast under Spark's own size estimate when small.
    * Exactly the rows with rank ≤ n under (score DESC, id ASC) survive
    * — deterministic, partition-invariant, and replayable as a SQL
    * window for verification.
    *
    * Honest trade (measured, SCALE.md): on BALANCED groups a plain
    * rank window is ~2× faster — one codegen'd sort, no UDAF, no join
    * — so `viaWindow = true` offers it. The heap path is the default
    * because its per-group state is n PAIRS regardless of group size:
    * a web corpus routinely has one domain holding percents of it, and
    * the window's cost there is a sort of that whole group on one
    * task.
    */
  def capPerGroup(df: DataFrame, groupCol: String, score: Column,
      idCol: String, n: Int, viaWindow: Boolean = false): DataFrame = {
    require(n >= 1, s"cap must be >= 1, got $n")
    import org.apache.spark.sql.types._
    val idType = df.select(col(idCol)).schema.head.dataType
    val integralId = idType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case StringType => false
      case other => throw new IllegalArgumentException(
        s"capPerGroup id column '$idCol' must be integral or string for a " +
        s"deterministic tie-break, got $other")
    }
    // NaN folds to null folds to −∞ so BOTH paths rank it identically
    // last: the window's q DESC would rank NaN above every double while
    // the heap's `>`/`===` comparisons are false for NaN — normalizing
    // here keeps the documented heap≡window equivalence.
    val scoreD = coalesce(nanvl(score.cast("double"), lit(null)),
      lit(Double.NegativeInfinity))
    if (viaWindow) {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(groupCol)
        .orderBy(scoreD.desc, col(idCol).asc)
      return df.withColumn("__cap_rn", row_number().over(w))
        .filter(col("__cap_rn") <= n).drop("__cap_rn")
    }
    // Tie key by id type: integral ids rank as longs; string ids rank as
    // UTF-8 bytes (the aggregator's unsigned byte comparison == Spark's
    // binary/UTF8String ordering, so the filter's `<=` agrees exactly).
    val (tieKey, agg) =
      if (integralId) (col(idCol).cast("long"), udaf(new CapThresholdAgg(n)))
      else (col(idCol).cast("binary"), udaf(new CapThresholdAggBin(n)))
    val th = df
      .select(col(groupCol).as("__cap_g"), scoreD.as("__s"),
        tieKey.as("__i"))
      .groupBy("__cap_g")
      .agg(agg.apply(col("__s"), col("__i")).as("__cap_th"))
    // eqNullSafe: a NULL group is a group like any other under the
    // window path's partitionBy, so the heap path must cap it too — a
    // plain === would never match, hand every null-group row a null
    // threshold, and let the whole group escape the cap.
    df.join(th, col(groupCol) <=> col("__cap_g"), "left")
      .filter(col("__cap_th._1").isNull ||
        scoreD > col("__cap_th._1") ||
        (scoreD === col("__cap_th._1") &&
          tieKey <= col("__cap_th._2")))
      .drop("__cap_g", "__cap_th")
  }

  /** [[capPerGroup]]'s bounded heap: accumulates each group's n best
    * (score, id) pairs — "best" = higher score, then lower id — and
    * finishes with the n-th best as the group's cut line, or (null,
    * null) when the group never reached the cap (keep everything).
    * Buffer work is amortized: pairs append freely and compact to the
    * best n whenever 2n accumulate.
    */
  class CapThresholdAgg(n: Int)
      extends org.apache.spark.sql.expressions
        .Aggregator[(Double, Long), Seq[(Double, Long)],
          (java.lang.Double, java.lang.Long)] {
    private def best(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
      s.sortBy { case (sc, id) => (-sc, id) }.take(n)
    def zero: Seq[(Double, Long)] = Vector.empty
    def reduce(b: Seq[(Double, Long)], v: (Double, Long))
        : Seq[(Double, Long)] = {
      val nb = b :+ v
      if (nb.length >= 2 * n) best(nb) else nb
    }
    def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)])
        : Seq[(Double, Long)] = best(a ++ b)
    def finish(b: Seq[(Double, Long)])
        : (java.lang.Double, java.lang.Long) = {
      val s = best(b)
      if (s.length < n) (null, null)
      else (Double.box(s(n - 1)._1), Long.box(s(n - 1)._2))
    }
    def bufferEncoder
        : org.apache.spark.sql.Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Seq[(Double, Long)]]()
    def outputEncoder
        : org.apache.spark.sql.Encoder[(java.lang.Double, java.lang.Long)] =
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[(java.lang.Double, java.lang.Long)]()
  }

  /** [[CapThresholdAgg]] for STRING ids: the tie key is the id's UTF-8
    * bytes and "lower id" means unsigned lexicographic byte order —
    * exactly Spark's `binary` / `UTF8String` comparison, so the
    * post-join `<=` filter and the window path's `idCol.asc` agree.
    */
  class CapThresholdAggBin(n: Int)
      extends org.apache.spark.sql.expressions
        .Aggregator[(Double, Array[Byte]), Seq[(Double, Array[Byte])],
          (java.lang.Double, Array[Byte])] {
    private val byteOrd: Ordering[Array[Byte]] = (a, b) => {
      var i = 0
      var c = 0
      val len = math.min(a.length, b.length)
      while (i < len && c == 0) {
        c = (a(i) & 0xff) - (b(i) & 0xff)
        i += 1
      }
      if (c != 0) c else a.length - b.length
    }
    private def best(s: Seq[(Double, Array[Byte])])
        : Seq[(Double, Array[Byte])] =
      s.sortBy { case (sc, id) => (-sc, id) }(
        Ordering.Tuple2(Ordering.Double.TotalOrdering, byteOrd)).take(n)
    def zero: Seq[(Double, Array[Byte])] = Vector.empty
    def reduce(b: Seq[(Double, Array[Byte])], v: (Double, Array[Byte]))
        : Seq[(Double, Array[Byte])] = {
      val nb = b :+ v
      if (nb.length >= 2 * n) best(nb) else nb
    }
    def merge(a: Seq[(Double, Array[Byte])], b: Seq[(Double, Array[Byte])])
        : Seq[(Double, Array[Byte])] = best(a ++ b)
    def finish(b: Seq[(Double, Array[Byte])])
        : (java.lang.Double, Array[Byte]) = {
      val s = best(b)
      if (s.length < n) (null, null)
      else (Double.box(s(n - 1)._1), s(n - 1)._2)
    }
    def bufferEncoder
        : org.apache.spark.sql.Encoder[Seq[(Double, Array[Byte])]] =
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Seq[(Double, Array[Byte])]]()
    def outputEncoder
        : org.apache.spark.sql.Encoder[(java.lang.Double, Array[Byte])] =
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[(java.lang.Double, Array[Byte])]()
  }

  def packBudget(df: DataFrame, orderCol: String, tokens: Column,
      budget: Long, shardCol: String): DataFrame = {
    require(budget >= 1, "budget must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(shardCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("n_tokens", tokens.cast("long"))
      .withColumn("__before", sum(col("n_tokens")).over(w) - col("n_tokens"))
      // integer division (`div`, not `/`): Column./ is double division,
      // which would lose exactness past 2^53 cumulative tokens per shard
      .withColumn("pack_id", expr(s"__before div ${budget}L"))
      .drop("__before")
  }
}
