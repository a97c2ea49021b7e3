package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, each designed
  * around the 100 TB execution shape:
  *
  *   - exact: one hash-aggregate on the content key, no driver state;
  *   - MinHash+LSH: per-row signatures (codegen expressions), band-bucket
  *     explode (b× row inflation, bounded), shuffle on (band, key) — the
  *     classic shingle->minhash->band->bucket-join pipeline; candidate
  *     verification stays inside buckets so no quadratic blowup;
  *   - SimHash: 64-bit signature + chunk-banding, Hamming verify via
  *     `bit_count(xor)`;
  *   - n-gram Jaccard: exact set similarity, but only on LSH candidates;
  *   - embedding cosine: delegates candidate generation to
  *     [[Similarity.SignLsh]] buckets.
  *
  * Skew note: a degenerate bucket (e.g. empty-text documents) would make
  * the in-bucket pair join quadratic; `maxBucket` drops buckets above a
  * bound and reports them — at scale those buckets are handled by exact
  * dedup on the fingerprint instead (they're near-identical anyway).
  */
object Dedup {

  // ------------------------------------------------------------- exact

  /** Exact dedup on a content key: keep the min-id representative.
    * Returns (key, keep_id, n_dups). One shuffle on the key.
    */
  def exactGroups(df: DataFrame, idCol: String, keyCols: Seq[Column],
      keyName: String = "dup_key"): DataFrame =
    df.groupBy(keyCols.map(_.as(keyName)): _*)
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Exact dedup: drop all but the min-id row per normalized-content key.
    * Window-free formulation (self-join on the winner) broadcast-joins the
    * winners when small; at scale prefer this over a global row_number.
    */
  def exactDedup(df: DataFrame, idCol: String, key: Column): DataFrame = {
    val winners = df.groupBy(key.as("__k"))
      .agg(min(col(idCol)).as(idCol))
    df.join(winners.select(col(idCol)), Seq(idCol), "left_semi")
  }

  // ------------------------------------------------- minhash signatures

  /** FNV-1a 64-bit base hash + murmur-style seed mixing. */
  @inline private def fnv1a(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i); h *= 0x100000001b3L; i += 1 }
    h
  }
  @inline private def mix(h: Long, seed: Int): Long = {
    var x = h ^ (seed.toLong * 0x9E3779B97F4A7C15L)
    x ^= x >>> 33; x *= 0xFF51AFD7ED558CCDL; x ^= x >>> 33
    x
  }

  /** Signature kernel shared by the UDF entry points. */
  private def sigFromBases(base: Array[Long], k: Int): Array[Long] = {
    val sig = new Array[Long](k)
    var i = 0
    while (i < k) {
      var best = Long.MaxValue
      var j = 0
      while (j < base.length) {
        val h = mix(base(j), i)
        if (h < best) best = h
        j += 1
      }
      sig(i) = best
      i += 1
    }
    sig
  }

  /** k MinHash values over a shingle array, as one row-local kernel: each
    * shingle is base-hashed ONCE, then k cheap integer mixes derive the k
    * hash families. A higher-order-expression formulation recomputes the
    * shingle-construction subtree inside the k-way lambda (Catalyst
    * re-evaluates the captured subtree per outer element — measured 60×
    * slower at sf0.1), so the tight JVM loop is the scalable form here.
    * Empty input -> null.
    */
  def minhashSigUdf(k: Int = 64) = udf { shingles: Seq[String] =>
    if (shingles == null || shingles.isEmpty) null
    else sigFromBases(shingles.map(fnv1a).toArray, k)
  }

  /** Tokenize + shingle + sign in ONE kernel straight from the text
    * column. Semantically identical to
    * `minhashSigUdf(k)(Shingles.wordShingles(text, n))`, but the whole
    * shingle pipeline lives inside the function: the Catalyst tree is a
    * single UDF call, so query compile time (which dominates the
    * higher-order formulation — big lambda trees cost seconds of
    * Catalyst+Janino work per query) stays flat. The shingle string is
    * hashed incrementally (token hashes remixed) — no per-shingle string
    * allocation at all.
    */
  def minhashSigFromText(n: Int, k: Int) = udf { text: String =>
    if (text == null) null
    else {
      val trimmed = text.toLowerCase.trim
      if (trimmed.isEmpty) null
      else {
        val toks = trimmed.split("\\s+")
        if (toks.length < n) null
        else {
          // base hash per shingle = FNV over the n tokens joined by ' '
          val nShingles = toks.length - n + 1
          val base = new Array[Long](nShingles)
          var s = 0
          while (s < nShingles) {
            var h = 0xcbf29ce484222325L
            var t = 0
            while (t < n) {
              if (t > 0) { h ^= ' '; h *= 0x100000001b3L }
              val tok = toks(s + t)
              var c = 0
              while (c < tok.length) { h ^= tok.charAt(c); h *= 0x100000001b3L; c += 1 }
              t += 1
            }
            base(s) = h
            s += 1
          }
          sigFromBases(base, k)
        }
      }
    }
  }

  /** LSH band keys for a signature: b bands of r rows; band j's key is the
    * hash of rows [j*r, (j+1)*r). Output: array of b longs.
    */
  def bandKeys(sig: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      j => xxhash64(concat_ws(",",
        transform(slice(sig, j * rows + 1, lit(rows)), x => x.cast("string")))))

  /** Estimated Jaccard between two equal-length signatures: fraction of
    * agreeing minhash positions.
    */
  def estJaccard(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v).cast("double") / size(a)

  /** Candidate duplicate pairs via MinHash-LSH.
    *
    * @return (id_a, id_b, est_jaccard) with id_a < id_b, est >= threshold.
    */
  /** Signatures table (id, sig) for a text column. */
  def signatures(df: DataFrame, idCol: String, text: Column,
      shingleN: Int, k: Int): DataFrame =
    df.select(col(idCol).as("id"),
        minhashSigFromText(shingleN, k)(text).as("sig"))
      .filter(col("sig").isNotNull)

  def minhashCandidates(df: DataFrame, idCol: String, text: Column,
      shingleN: Int = 3, k: Int = 64, bands: Int = 16,
      threshold: Double = 0.7, maxBucket: Int = 1000): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val r = k / bands
    val sigs = signatures(df, idCol, text, shingleN, k)

    // explode band keys -> shuffle SLIM (id, band, key) rows only; the
    // 64-long signatures never ride through the explode/self-join
    val buckets = sigs.select(col("id"),
      posexplode(bandKeys(col("sig"), bands, r)).as(Seq("band", "key")))

    // in-bucket pairing via self-join on (band, key), id_a < id_b;
    // bucket-size cap guards against degenerate (skewed) buckets
    val sized = buckets.withColumn("bucket_n",
      count(lit(1)).over(Window.partitionBy("band", "key")))
      .filter(col("bucket_n") <= maxBucket)
    val a = sized.select(col("band"), col("key"), col("id").as("id_a"))
    val b = sized.select(col("band"), col("key"), col("id").as("id_b"))
    val candidates = a.join(b, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct() // dedup across bands BEFORE the (64-wide) verify join

    candidates
      .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
      .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        estJaccard(col("sig_a"), col("sig_b")).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }

  /** MinHash-LSH dedup: drop every row that has a smaller-id near-duplicate
    * (connected-component-free greedy: survivor = not dominated by any
    * smaller id; transitive chains keep only chain minima's view).
    */
  def minhashDedup(df: DataFrame, idCol: String, text: Column,
      shingleN: Int = 3, k: Int = 64, bands: Int = 16,
      threshold: Double = 0.7): DataFrame = {
    val dominated = minhashCandidates(df, idCol, text, shingleN, k, bands,
      threshold).select(col("id_b").as(idCol)).distinct()
    df.join(dominated, Seq(idCol), "left_anti")
  }

  // ----------------------------------------------------------- simhash

  /** 64-bit SimHash of a token array (Charikar): per bit, sum +1/-1 over
    * token hashes; bit set iff the sum is positive. Implemented as a Scala
    * UDF (the 64-way bit loop is clearer and faster in JVM code than a
    * 64-element higher-order expression); still fully distributed/row-local.
    */
  val simhash64 = udf { toks: Seq[String] =>
    if (toks == null || toks.isEmpty) null
    else {
      val counts = new Array[Int](64)
      toks.foreach { t =>
        // xxhash-free deterministic 64-bit string hash (FNV-1a)
        var h = 0xcbf29ce484222325L
        var i = 0
        while (i < t.length) { h ^= t.charAt(i); h *= 0x100000001b3L; i += 1 }
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      var out = 0L
      var b = 0
      while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
      java.lang.Long.valueOf(out)
    }
  }

  /** SimHash near-dup pairs: band the 64-bit signature into 4 16-bit chunks
    * (any pair within Hamming distance 3 shares >=1 exact chunk), bucket-join
    * on (chunk index, chunk value), verify with bit_count(xor) <= maxHamming.
    */
  def simhashCandidates(df: DataFrame, idCol: String, text: Column,
      maxHamming: Int = 3, maxBucket: Int = 1000): DataFrame = {
    val sigs = df.select(col(idCol).as("id"),
        simhash64(TextAnalysis.tokensCol(lower(text))).as("sig"))
      .filter(col("sig").isNotNull)
    val chunks = (0 until 4).map(j =>
      shiftright(col("sig"), j * 16).bitwiseAND(lit(0xFFFFL)))
    val chunked = sigs.select(col("id"), col("sig"),
      posexplode(array(chunks: _*)).as(Seq("chunk", "ckey")))
    val sized = chunked.withColumn("bucket_n",
      count(lit(1)).over(Window.partitionBy("chunk", "ckey")))
      .filter(col("bucket_n") <= maxBucket)
    val a = sized.select(col("chunk"), col("ckey"),
      col("id").as("id_a"), col("sig").as("sig_a"))
    val b = sized.select(col("chunk"), col("ckey"),
      col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("chunk", "ckey"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  // ---------------------------------------------------- n-gram jaccard

  /** Exact n-gram Jaccard similarity between two shingle-set columns. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    val uni = size(array_union(a, b))
    when(uni === 0, 0.0).otherwise(inter.cast("double") / uni.cast("double"))
  }

  /** Distinct word-shingle set as one kernel (same rationale as
    * [[minhashSigFromText]]: flat Catalyst tree, no per-query lambda
    * compile cost).
    */
  def distinctShinglesUdf(n: Int) = udf { text: String =>
    if (text == null) null
    else {
      val toks = text.toLowerCase.trim.split("\\s+")
      if (toks.length < n) Seq.empty[String]
      else (0 to toks.length - n).map(i =>
        toks.slice(i, i + n).mkString(" ")).distinct
    }
  }

  /** Near-dup pairs by exact n-gram Jaccard, with MinHash-LSH candidate
    * generation (never all-pairs): estimate prunes, exact verifies.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, text: Column,
      n: Int = 3, threshold: Double = 0.8): DataFrame = {
    val shingled = df.select(col(idCol).as("jid"),
      distinctShinglesUdf(n)(text).as("sh"))
    // LSH candidates at a looser estimated threshold, then exact verify
    val cand = minhashCandidates(df, idCol, text, n,
      threshold = math.max(0.0, threshold - 0.2))
    cand
      .join(shingled.withColumnRenamed("jid", "id_a")
        .withColumnRenamed("sh", "sh_a"), Seq("id_a"))
      .join(shingled.withColumnRenamed("jid", "id_b")
        .withColumnRenamed("sh", "sh_b"), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  // ------------------------------------------- embedding cosine near-dup

  /** Embedding near-duplicate pairs: cosine >= threshold, candidates from
    * sign-LSH buckets (Similarity.SignLsh) — no all-pairs cross join.
    */
  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, threshold: Double = 0.95, planes: Int = 8): DataFrame = {
    val bucketed = Similarity.SignLsh.withBucket(df, vecCol, dim, planes)
    val a = bucketed.select(col("bucket"), col(idCol).as("id_a"),
      col(vecCol).as("vec_a"))
    val b = bucketed.select(col("bucket"), col(idCol).as("id_b"),
      col(vecCol).as("vec_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        Similarity.cosine(col("vec_a"), col("vec_b")).as("cosine"))
      .distinct()
      .filter(col("cosine") >= threshold)
  }
}
