package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.{Dedup, Similarity, TextAnalysis}

/** Empirical scale check for the pipeline operators: inflate documents by
  * `factor` (deterministic per-copy token edits so copies of different
  * rows don't collide, while copy 0/1 of the same row stay near-dups),
  * write to parquet, and time the dedup/search/analysis paths at 1x and
  * `factor`x. Healthy shapes scale near-linearly; a quadratic candidate
  * explosion or a skew-collapsed bucket shows up immediately.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.ScaleSmoke 20"
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(20)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val n = docs.count()
    val big = s"/tmp/graft_scale_docs_$factor"
    // copy c of doc d: id = d*factor + c, text prefixed with a copy marker
    // token so different copies are near-dups of each other (same body)
    // but distinct rows; bodies of different docs stay unrelated
    docs.crossJoin(spark.range(factor).toDF("copy"))
      .select((col("doc_id") * factor + col("copy")).as("doc_id"),
        concat(lit("copymark"), col("copy") % 2, lit(" "), col("text")).as("text"))
      .write.mode("overwrite").parquet(big)
    val inflated = spark.read.parquet(big)
    println(s"SCALE base=$n inflated=${inflated.count()} (${factor}x)")

    def time(label: String)(f: DataFrame): Unit = {
      val t0 = System.nanoTime()
      val rows = f.count()
      println(f"SCALE $label%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$rows")
    }

    Seq(("1x", docs), (s"${factor}x", inflated)).foreach { case (tag, d) =>
      println(s"--- $tag")
      time(s"exact_dedup")(Dedup.exactGroups(d, "doc_id",
        Seq(TextAnalysis.fingerprint(col("text")))))
      time(s"minhash")(Dedup.minhashCandidates(d, "doc_id", col("text"),
        threshold = 0.8))
      time(s"simhash")(Dedup.simhashCandidates(d, "doc_id", col("text")))
      time(s"ngram")(Dedup.ngramJaccardPairs(d, "doc_id", col("text"),
        threshold = 0.8))
      time(s"text_stats")(TextAnalysis.enrich(d, "text"))
      // r18: one_to_many sem_map — Generate-only fan-out, must scale
      // with input rows × per-row matches (no shuffle at any size)
      time(s"sem_map_multi")(graft.ops.SemMapMulti(d,
        graft.plan.LogicalOp.SemMap(Seq("text"), "([a-z]*ar[a-z]*)", "term"),
        graft.oracle.DeterministicOracle.default))
      // round-2 ops: cross-corpus join (vs an id-shifted copy) and the
      // deterministic split — both must scale like their inputs
      val shifted = d.select((col("doc_id") + lit(100000000L)).as("rid"),
        col("text"))
      time(s"fuzzy_join")(Dedup.ngramJaccardJoin(d, "doc_id", col("text"),
        shifted, "rid", col("text"), threshold = 0.8))
      time(s"hash_split")(graft.pipeline.Sampling.withSplit(d, "doc_id"))
      // exact inverted-index Jaccard in its documented at-scale
      // composition: exact dedup FIRST (collapses the copy groups whose
      // shingle document-frequency would otherwise grow the equi-join
      // quadratically), then the exact pair pass on a bounded subset
      val deduped = Dedup.exactDedup(d, "doc_id",
        TextAnalysis.fingerprint(col("text")))
        .filter(col("doc_id") < 1000L * factor)
      time(s"exact_jaccard")(Dedup.exactJaccardPairs(deduped, "doc_id",
        col("text"), threshold = 0.8))
      // round-4 ops. decontaminate: the train side's DISTINCT shingle set
      // absorbs the copy inflation (copies collapse), so the semi-join
      // right side stays ~constant while the left grows linearly — the
      // shape that must NOT go quadratic here
      time(s"decontaminate")(graft.pipeline.Decontaminate.overlapCounts(
        d.filter(col("doc_id") % 10 === 0), "doc_id", "text",
        d.filter(col("doc_id") % 10 =!= 0), "text"))
      val merges = graft.pipeline.Bpe.train(d, "text", nMerges = 8)
      time(s"bpe_tokenize")(graft.pipeline.Bpe.tokenize(d, "text", merges))
      time(s"tfidf")(graft.pipeline.Frequency.tfidfTopTerms(
        d, "doc_id", "text", k = 3))
      // round-9 kernels (VERDICT: "the heaviest kernels, measured"):
      // corpus-curation chain, Merge upsert, IVF-PQ build + probe
      time(s"curation_chain")(graft.pipeline.Clean.standardPipeline(
        d, "doc_id", "text"))
      // ExactSubstr spans: one explode ≈ one row per token, one owner
      // aggregate, one join back — must scale with token count (the
      // copy inflation multiplies dup spans, so cut work grows too).
      // The filter references the rewritten text so count() cannot
      // eliminate the join and skip the work.
      time(s"dedup_spans")(Dedup.dedupSpans(d, "doc_id", "text",
        windowTokens = 8).where(length(col("text")) >= 0))
      // DSIR hashed mode: two feature aggregates + ONE broadcast array
      // + a row-local weigh scan + TakeOrdered — nothing joins the
      // corpus
      time(s"dsir_resample")(graft.pipeline.Dsir.resample(
        d, "doc_id", "text", d.filter(col("doc_id") % 11 === 0),
        k = 100, n = 2, buckets = 10000))
      // r13: PageRank redistribute mode — the graph (nodes AND edges)
      // grows with the corpus; 10 one-job rounds over the pinned
      // sort-once edge list must scale ~linearly in |E|. pageRank does
      // its eager pinning when CALLED, so time the whole call by name.
      locally {
        val nNodes = d.count()
        val edges = d.select(col("doc_id").as("src"),
          ((col("doc_id") * 31 + 7) % lit(nNodes)).as("dst"))
        val t0 = System.nanoTime()
        val rows = graft.pipeline.Graph.pageRank(edges, "src", "dst",
          iters = 10, redistributeDangling = true).count()
        println(f"SCALE pagerank_redistrib   " +
          f"${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$rows")
      }
    }

    // ---- Merge upsert at 1x vs factor x. The honest scale story: the
    // layout scales WITH the table (nBuckets ∝ rows keeps bucket size
    // constant), and then a fixed-size upsert's cost is ∝ its touched
    // buckets — near-flat across table sizes, the copy-on-write contract.
    def timed(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"SCALE $label%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    Seq(("1x", docs, 64), (s"${factor}x", inflated, 64 * factor)).foreach {
      case (tag, d, buckets) =>
        println(s"--- $tag merge (nBuckets=$buckets)")
        // the table lives INSIDE a per-tag dir so a directory-mode
        // catalog can resolve it by name for the SQL DML measurements
        val catRoot = s"/tmp/graft_scale_merge_$tag"
        val path = s"$catRoot/t"
        timed(s"merge_write")(
          graft.sources.Merge.writeKeyed(d, path, "doc_id", buckets,
            statsCols = Seq("doc_id"))) // r10: stats carry row counts
        // anchor a graft-table stream at "latest" BEFORE the upsert so
        // the post-upsert tail drains exactly one commit
        val ckpt = s"${path}_tail_ckpt"
        org.apache.commons.io.FileUtils.deleteQuietly(
          new java.io.File(ckpt))
        def tail(): Long = {
          val n = new java.util.concurrent.atomic.AtomicLong(0)
          val q = spark.readStream.format("graft-table")
            .option("path", path).option("startingVersion", "latest")
            .load().writeStream.option("checkpointLocation", ckpt)
            .foreachBatch { (b: DataFrame, _: Long) =>
              n.addAndGet(b.count()); ()
            }
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
          n.get()
        }
        tail() // writes the anchor, drains nothing
        val batch = d.filter(col("doc_id") % 997 === 0)
          .withColumn("text", concat(col("text"), lit(" upd")))
        timed(s"merge_upsert")({
          val st = graft.sources.Merge.upsert(spark, path, batch,
            "doc_id", buckets)
          println(s"SCALE   upsert touched ${st.bucketsTouched}/$buckets " +
            s"buckets, ${st.rowsUpserted} rows")
        })
        // the stream's micro-batch reads the commit's touched buckets,
        // never the table: flat across table sizes
        timed(s"table_stream_tail")({
          val rows = tail()
          println(s"SCALE   tailed $rows change rows")
        })
        // r13 COPY INTO: cost = list + idempotence-set read (O(retained
        // manifests)) + the fresh files' read + a touched-bucket upsert
        // — ∝ the LANDED data, never the table; the re-sweep is
        // manifest-only
        locally {
          val landing = s"$catRoot/landing"
          org.apache.commons.io.FileUtils.deleteQuietly(
            new java.io.File(landing))
          d.filter(col("doc_id") % 499 === 0)
            .withColumn("doc_id", col("doc_id") + lit(900000000L))
            .coalesce(2).write.mode("overwrite").parquet(landing)
          timed(s"copy_into")({
            val st = graft.sources.Merge.copyInto(spark, path, landing)
            println(s"SCALE   copied ${st.filesCopied} files, " +
              s"${st.rowsCopied} rows")
          })
          timed(s"copy_into_resweep")({
            val st = graft.sources.Merge.copyInto(spark, path, landing)
            require(st.filesCopied == 0, s"re-sweep must load nothing")
          })
        }
        // shallow clone: one manifest write at ANY table size
        timed(s"merge_clone")(graft.sources.Merge.cloneTable(spark, path,
          s"${path}_clone"))
        // r10: column rename is ONE manifest write at any table size
        // (column mapping is metadata), and the DSv2 manifest-answered
        // aggregate is one driver-side manifest read — both must be
        // flat across table sizes
        timed(s"col_rename")(
          graft.sources.Merge.renameColumn(spark, path, "text", "body"))
        timed(s"dsv2_agg")({
          val r = spark.read.format("graft-table").option("path", path)
            .load()
            .agg(count(lit(1)), min(col("doc_id")), max(col("doc_id")))
            .collect()(0)
          println(s"SCALE   manifest agg -> ${r.mkString(", ")}")
        })
        timed(s"col_rename_back")(
          graft.sources.Merge.renameColumn(spark, path, "body", "text"))
        // merge-on-read delete: find scan + matched-rows-sized sidecar,
        // ZERO data files rewritten — contrast with the copy-on-write
        // delete's bucket rewrites
        timed(s"merge_delete_dv")({
          val st = graft.sources.Merge.deleteWhereDV(spark, path,
            col("doc_id") % 499 === 0)
          println(s"SCALE   dv deleted ${st.rowsDeleted} rows, " +
            "0 files rewritten")
        })
        // relayout: the honest full-shuffle cost of bucket evolution
        timed(s"merge_relayout")(
          graft.sources.Merge.relayout(spark, path, buckets * 2))
        // r10: SQL UPDATE / MERGE INTO — the same ~0.1% key slice as
        // merge_upsert, through the analyzer-rule doorway; must cost
        // ∝ touched buckets (the statements' change sets), never the
        // table
        val cat = s"gscale_$tag"
        spark.conf.set(s"spark.sql.catalog.$cat",
          "graft.sources.v2.GraftCatalog")
        spark.conf.set(s"spark.sql.catalog.$cat.root", catRoot)
        timed(s"sql_update")(
          spark.sql(s"UPDATE $cat.t SET text = concat(text, ' squ') " +
            "WHERE doc_id % 997 = 1").collect())
        val mrgSrc = s"graft_scale_mrg_src_$tag"
        d.filter(col("doc_id") % 997 === 2)
          .select(col("doc_id"),
            concat(col("text"), lit(" sqm")).as("text"))
          .createOrReplaceTempView(mrgSrc)
        timed(s"sql_merge")(
          spark.sql(s"""MERGE INTO $cat.t t USING $mrgSrc s
            ON t.doc_id = s.doc_id
            WHEN MATCHED THEN UPDATE SET text = s.text
            WHEN NOT MATCHED THEN INSERT (doc_id, text)
              VALUES (s.doc_id, s.text)""").collect())
    }

    // ---- IVF-PQ: build+save and probe at 1x vs factor x (cells ∝ size
    // keeps cell size ~constant; the probe scans nProbe cells only)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    val embBig = emb.crossJoin(spark.range(factor).toDF("copy"))
      .select((col("vec_id") * factor + col("copy")).as("vec_id"),
        col("embedding"))
      .localCheckpoint(true)
    val queries = emb.filter(col("vec_id") < 100)
      .select(col("vec_id").as("qid"), col("embedding"))
    Seq(("1x", emb, 8), (s"${factor}x", embBig, 8 * factor)).foreach {
      case (tag, e, cells) =>
        println(s"--- $tag ivfpq (cells=$cells)")
        val path = s"/tmp/graft_scale_ivfpq_$tag"
        timed(s"ivfpq_build")(graft.pipeline.Similarity.IvfPq.save(
          graft.pipeline.Similarity.IvfPq.build(e, "vec_id", "embedding",
            dim = 64, cells = cells, m = 8, kSub = 64), path))
        time(s"ivfpq_probe")(graft.pipeline.Similarity.IvfPq.topKPersisted(
          spark, path, queries, "qid", "embedding", k = 10, nProbe = 2))
        // SemDeDup: k ∝ corpus keeps cluster size ~constant (the
        // paper's own scaling rule); exact copies make the dup-group
        // structure real, so CC + survivor work grows with copies
        time(s"sem_dedup")(Dedup.semDedup(e, "vec_id", "embedding",
          dim = 64, k = cells * 2, kmeansIters = 1, threshold = 0.99))
    }

    // ---- TableCatalog (r9): a FIXED-SIZE cross-table transaction (fact
    // batch + its rollup, CHECK-constrained) must stay flat across table
    // sizes — its cost is the two members' touched buckets plus one
    // catalog JSON claim; nothing scales with the corpus.
    Seq(("1x", docs, 64), (s"${factor}x", inflated, 64 * factor)).foreach {
      case (tag, d, buckets) =>
        println(s"--- $tag txn_catalog (nBuckets=$buckets)")
        val factPath = s"/tmp/graft_scale_cat_fact_$tag"
        val statPath = s"/tmp/graft_scale_cat_stat_$tag"
        val catPath = s"/tmp/graft_scale_cat_log_$tag"
        org.apache.commons.io.FileUtils.deleteQuietly(
          new java.io.File(catPath))
        timed(s"cat_members_write")({
          graft.sources.Merge.writeKeyed(d, factPath, "doc_id", buckets,
            constraints = Seq(("id_notnull", "doc_id IS NOT NULL")))
          graft.sources.Merge.writeKeyed(
            d.groupBy((col("doc_id") % 997).as("grp"))
              .agg(count(lit(1)).as("cnt")), statPath, "grp", 64)
          graft.sources.TableCatalog.create(spark, catPath,
            Map("fact" -> factPath, "stats" -> statPath))
        })
        val batch = d.limit(500)
          .withColumn("text", concat(col("text"), lit(" upd")))
          .localCheckpoint(true)
        timed(s"cat_transact")({
          val st = graft.sources.TableCatalog.transact(spark, catPath, Seq(
            graft.sources.TableCatalog.TxnUpsert("fact", batch),
            graft.sources.TableCatalog.TxnUpsert("stats",
              batch.groupBy((col("doc_id") % 997).as("grp"))
                .agg(count(lit(1)).as("cnt")))))
          println(s"SCALE   catalog v${st.version} pins " +
            st.pins.toSeq.sortBy(_._1)
              .map { case (n, p) => s"$n@v${p.version}" }.mkString(", "))
        })
    }

    // ---- r14 QUALITY-CLASSIFIER TRAINING: each iteration is one
    // featurized-corpus pass + a <= dim+1-key aggregation, so training
    // cost must scale ~linearly with the corpus (never with dim²) and
    // scoring is a pure scan.
    Seq(("1x", docs), (s"${factor}x", inflated)).foreach { case (tag, d) =>
      println(s"--- $tag quality_train")
      val labeled = d.withColumn("label",
        (col("doc_id") % 2 === 0).cast("int"))
        .withColumn("text", concat(col("text"),
          when(col("doc_id") % 2 === 0, lit(" qualhi"))
            .otherwise(lit(" quallo"))))
      var model: graft.pipeline.QualityModel.Model = null
      timed(s"quality_train")({
        model = graft.pipeline.QualityModel.train(labeled, "text",
          "label", dim = 1 << 15, iters = 10)
      })
      time(s"quality_score")(labeled.withColumn("s",
        graft.pipeline.QualityModel.scoreCol(model, col("text"))))
    }

    // ---- r14 STORAGE-PARTITIONED JOIN: the same co-bucketed join,
    // shuffled vs exchange-free under the native bucket scan. The
    // shuffled plan exchanges both sides (payload included); SPJ reads
    // matching buckets side by side — the gap widens with the
    // exchanged bytes, which is the whole 100 TB argument.
    Seq(("1x", docs, 64), (s"${factor}x", inflated, 64 * factor)).foreach {
      case (tag, d, buckets) =>
        println(s"--- $tag spj (nBuckets=$buckets)")
        val base = s"/tmp/graft_scale_spj_$tag"
        org.apache.commons.io.FileUtils.deleteQuietly(
          new java.io.File(base))
        val cat = s"gspjscale_$tag"
        spark.conf.set(s"spark.sql.catalog.$cat",
          "graft.sources.v2.GraftCatalog")
        spark.conf.set(s"spark.sql.catalog.$cat.root", base)
        graft.sources.Merge.writeKeyed(d, s"$base/a", "doc_id", buckets)
        graft.sources.Merge.writeKeyed(
          d.select(col("doc_id"), length(col("text")).as("len")),
          s"$base/b", "doc_id", buckets)
        // payload on BOTH sides so the shuffled plan pays real exchange
        // bytes; the aggregate keeps the result one row
        val q = s"SELECT count(*) AS n, sum(length(a.text) + b.len) " +
          s"AS s FROM $cat.a a JOIN $cat.b b ON a.doc_id = b.doc_id"
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        timed(s"join_shuffled")(
          println(s"SCALE   ${spark.sql(q).collect().head}"))
        spark.conf.set("spark.graft.bucketedScan", "true")
        spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
        spark.conf.set(
          "spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
        timed(s"join_spj")({
          val df = spark.sql(q)
          val plan = df.queryExecution.executedPlan.toString
          // the only exchange allowed is the global aggregate's
          // single-partition gather — the JOIN must not repartition
          require(!plan.contains("hashpartitioning"),
            s"the SPJ join must not exchange on the key:\n$plan")
          println(s"SCALE   ${df.collect().head}")
        })
        spark.conf.set("spark.graft.bucketedScan", "false")
        spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
        spark.conf.unset(
          "spark.sql.sources.v2.bucketing.pushPartValues.enabled")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }

    // ---- r15 PER-DOMAIN CAP: the bounded-heap threshold vs the
    // rank-window replay, head to head. The window sorts every
    // domain's FULL row set; the heap shuffles slim triplets and keeps
    // n pairs per group — the gap is the sort of the big groups.
    Seq(("1x", docs), (s"${factor}x", inflated)).foreach { case (tag, d) =>
      println(s"--- $tag domain_cap")
      val withDomain = d.select(col("doc_id"), col("text"),
        concat(lit("s"), col("doc_id") % 37).as("domain"))
      val q = graft.pipeline.TextAnalysis.qualityScore(col("text"))
      timed(s"cap_heap")(
        println("SCALE   kept " + graft.pipeline.Sampling
          .capPerGroup(withDomain, "domain", q, "doc_id", 50).count()))
      timed(s"cap_window")({
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("domain").orderBy(q.desc, col("doc_id").asc)
        println("SCALE   kept " + withDomain
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 50).count())
      })
    }

    // ---- r15 DV-BEARING SPJ: merge-on-read delete a 1% slice, then
    // the SAME exchange-free join through the native scan's row-index
    // skip mask. The DV overhead must track the DELETED rows (the
    // sidecar read + per-row hash probe), never the table — the CDC
    // steady state where r14 fell back to the shuffled bridge.
    Seq(("1x", 64), (s"${factor}x", 64 * factor)).foreach {
      case (tag, buckets) =>
        println(s"--- $tag spj_dv (nBuckets=$buckets)")
        val base = s"/tmp/graft_scale_spj_$tag" // the tables above
        val cat = s"gspjscale_$tag"
        val st = graft.sources.Merge.deleteWhereDV(spark, s"$base/a",
          col("doc_id") % 100 === 1)
        println(s"SCALE   dv deleted ${st.rowsDeleted} rows, " +
          "0 data files rewritten")
        val q = s"SELECT count(*) AS n, sum(length(a.text) + b.len) " +
          s"AS s FROM $cat.a a JOIN $cat.b b ON a.doc_id = b.doc_id"
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.graft.bucketedScan", "true")
        spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
        spark.conf.set(
          "spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
        timed(s"join_spj_dv")({
          val df = spark.sql(q)
          val plan = df.queryExecution.executedPlan.toString
          require(!plan.contains("hashpartitioning"),
            s"the DV-bearing SPJ join must not exchange on the key:\n" +
            plan)
          require(plan.contains("GraftBucketScan"),
            "the DV version must still read through the native scan")
          println(s"SCALE   ${df.collect().head}")
        })
        spark.conf.set("spark.graft.bucketedScan", "false")
        spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
        spark.conf.unset(
          "spark.sql.sources.v2.bucketing.pushPartValues.enabled")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }

    // ---- r16 DV SCAN THROUGHPUT: the CDC steady state's PLAIN scans.
    // The DV path stays vectorized (batches filtered by a positional
    // selection view), so scanning a DV-bearing table must run at ≈ the
    // compacted clean scan's throughput — not a row-mode penalty paid
    // on every read between compactions. Reuses the spj tables: `a` is
    // DV-bearing (1% deleted) from the block above; compaction then
    // folds the DVs and the SAME scan becomes the clean baseline.
    Seq("1x", s"${factor}x").foreach { tag =>
      println(s"--- $tag scan_dv")
      val base = s"/tmp/graft_scale_spj_$tag"
      val cat = s"gspjscale_$tag"
      val q = s"SELECT count(*) AS n, sum(length(text)) AS s FROM $cat.a"
      spark.conf.set("spark.graft.bucketedScan", "true")
      timed(s"scan_dv")({
        val df = spark.sql(q)
        val plan = df.queryExecution.executedPlan.toString
        require(plan.contains("GraftBucketScan") &&
            !plan.contains("dvFiles=0,"),
          s"the DV version must read through the native scan:\n$plan")
        println(s"SCALE   ${df.collect().head}")
      })
      graft.sources.Merge.compactVersion(spark, s"$base/a")
      timed(s"scan_clean")(
        println(s"SCALE   ${spark.sql(q).collect().head}"))
      spark.conf.set("spark.graft.bucketedScan", "false")
    }

    // ---- r16 DV SIDECAR FORMAT: the SAME ~1/3 delete through v1
    // (per-row) and v2 (bitmap) sidecars on one table. v2 writes one
    // row per touched FILE (delta-varint blob ≈ 1 B/position when
    // deletes cluster), so sidecar rows go O(deleted)→O(files) and the
    // COUNT(*) adjustment reads file-count rows instead of counting
    // deleted-row-sized parquet.
    Seq(("1x", docs, 64), (s"${factor}x", inflated, 64 * factor)).foreach {
      case (tag, d, buckets) =>
        println(s"--- $tag dv_sidecar (nBuckets=$buckets)")
        val path = s"/tmp/graft_scale_dvfmt_$tag"
        org.apache.commons.io.FileUtils.deleteQuietly(
          new java.io.File(path))
        graft.sources.Merge.writeKeyed(d, path, "doc_id", buckets,
          statsCols = Seq("doc_id"))
        val dvDir = new java.io.File(path, "_graft_dv")
        def footprint(): (Long, Long) = {
          if (!dvDir.exists()) return (0L, 0L)
          val bytes = org.apache.commons.io.FileUtils
            .sizeOfDirectory(dvDir)
          val rows = spark.read
            .schema(graft.sources.DvCodec.SupersetSchema)
            .parquet(dvDir.getAbsolutePath + "/*").count()
          (rows, bytes)
        }
        Seq(("v1_rows", false, 0), ("v2_bitmap", true, 1)).foreach {
          case (fmt, bm, slice) =>
            val (r0, b0) = footprint()
            timed(s"dv_delete_$fmt")({
              val st = graft.sources.Merge.deleteWhereDV(spark, path,
                col("doc_id") % 3 === slice, bitmapFormat = bm)
              println(s"SCALE   deleted ${st.rowsDeleted} rows")
            })
            val (r1, b1) = footprint()
            println(s"SCALE   sidecar_$fmt rows=${r1 - r0} " +
              s"bytes=${b1 - b0}")
            timed(s"dv_count_$fmt")(println("SCALE   live=" +
              graft.sources.Merge.versionRowCount(spark, path,
                graft.sources.Merge.currentVersion(spark, path))))
        }
    }

    // ---- r16 MERGE-ON-READ UPSERT: the same fixed ~0.1% batch as
    // merge_upsert, landed without rewriting a data file — old images
    // vectored + batch-sized appends. Must be ≤ the copy-on-write
    // upsert and flat-ish across table sizes (cost ∝ batch + touched-
    // bucket FIND scan, never bucket rewrites).
    Seq(("1x", docs, 64), (s"${factor}x", inflated, 64 * factor)).foreach {
      case (tag, d, buckets) =>
        println(s"--- $tag upsert_dv (nBuckets=$buckets)")
        val path = s"/tmp/graft_scale_mor_$tag"
        org.apache.commons.io.FileUtils.deleteQuietly(
          new java.io.File(path))
        graft.sources.Merge.writeKeyed(d, path, "doc_id", buckets,
          statsCols = Seq("doc_id"))
        val batch = d.filter(col("doc_id") % 997 === 0)
          .withColumn("text", concat(col("text"), lit(" mor")))
          .localCheckpoint(true)
        timed(s"upsert_dv")({
          val st = graft.sources.Merge.upsertDV(spark, path, batch,
            "doc_id", buckets)
          println(s"SCALE   mor-upserted ${st.rowsUpserted} rows, " +
            s"${st.rowsDeleted} vectored, 0 files rewritten")
        })
        // the fold this write shape defers to: targeted purge
        timed(s"upsert_dv_fold")({
          val cs = graft.sources.Merge.compactVersion(spark, path)
          println(s"SCALE   folded ${cs.bucketsRewritten}/$buckets " +
            "buckets")
        })
    }

    // ---- r16 COMPOSITE-KEY (grid) SPJ: two tables on the same
    // (shard, doc_id) grid join on BOTH columns exchange-free AND
    // sort-free (tuple-sorted cells) vs the shuffled control. The grid
    // scales per dimension — the gap is the same exchanged-bytes
    // argument as single-key SPJ.
    Seq(("1x", docs, 4), (s"${factor}x", inflated, 4 * factor)).foreach {
      case (tag, d, n2) =>
        println(s"--- $tag spj_multi (grid=8x$n2)")
        val base = s"/tmp/graft_scale_spjm_$tag"
        org.apache.commons.io.FileUtils.deleteQuietly(
          new java.io.File(base))
        val cat = s"gspjmscale_$tag"
        spark.conf.set(s"spark.sql.catalog.$cat",
          "graft.sources.v2.GraftCatalog")
        spark.conf.set(s"spark.sql.catalog.$cat.root", base)
        val keyed = d.select((col("doc_id") % 64).as("shard"),
          col("doc_id"), col("text"))
        graft.sources.Merge.writeKeyedCols(keyed, s"$base/a",
          Seq("shard", "doc_id"), Seq(8, n2))
        graft.sources.Merge.writeKeyedCols(
          keyed.select(col("shard"), col("doc_id"),
            length(col("text")).as("len")),
          s"$base/b", Seq("shard", "doc_id"), Seq(8, n2))
        val q = s"SELECT count(*) AS n, sum(length(a.text) + b.len) " +
          s"AS s FROM $cat.a a JOIN $cat.b b " +
          "ON a.shard = b.shard AND a.doc_id = b.doc_id"
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        timed(s"join_multi_shuffled")(
          println(s"SCALE   ${spark.sql(q).collect().head}"))
        spark.conf.set("spark.graft.bucketedScan", "true")
        spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
        spark.conf.set(
          "spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
        timed(s"join_multi_spj")({
          val df = spark.sql(q)
          val plan = df.queryExecution.executedPlan.toString
          require(!plan.contains("hashpartitioning"),
            s"the grid SPJ join must not exchange on the keys:\n$plan")
          println(s"SCALE   ${df.collect().head}")
        })
        spark.conf.set("spark.graft.bucketedScan", "false")
        spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
        spark.conf.unset(
          "spark.sql.sources.v2.bucketing.pushPartValues.enabled")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }

    // ---- r17 GRID UPSERT: the same fixed ~0.1%-of-base batch into a
    // (shard, doc_id) grid at 1x vs factor-x corpus (cells scale with
    // the table — the operating contract). Healthy shape: cost tracks
    // the BATCH's cells, so the wall time stays near-flat while the
    // table grows 10x — the cell-granular copy-on-write claim,
    // measured on the composite layout this time.
    Seq(("1x", docs, 4), (s"${factor}x", inflated, 4 * factor)).foreach {
      case (tag, d, n2) =>
        println(s"--- $tag grid_upsert (grid=8x$n2)")
        val base = s"/tmp/graft_scale_gridup_$tag"
        org.apache.commons.io.FileUtils.deleteQuietly(
          new java.io.File(base))
        val keyed = d.select((col("doc_id") % 64).as("shard"),
          col("doc_id"), col("text"))
        graft.sources.Merge.writeKeyedCols(keyed, s"$base/t",
          Seq("shard", "doc_id"), Seq(8, n2))
        val batch = keyed.orderBy("doc_id").limit(60)
          .withColumn("text", concat(lit("upd "), col("text")))
          .localCheckpoint()
        timed(s"grid_upsert_60rows")({
          val st = graft.sources.Merge.upsertGrid(spark, s"$base/t",
            batch)
          println(s"SCALE   touched=${st.bucketsTouched} of " +
            s"${st.nBuckets} cells")
        })
    }

    // ---- r17 EXTERNAL BLOOM SIDECARS (bloomx:): identical table +
    // filters, two layouts — inline blobs in the manifest vs
    // byte-sized refs + lazily-read sidecar files. The commit-cost
    // claim is MANIFEST SIZE (every commit rewrites it, every planner
    // parses it); the probe-cost claim is the seam's sidecar read
    // count (candidates only, decode-once cached).
    Seq(("1x", docs, 64), (s"${factor}x", inflated, 64 * factor))
      .foreach { case (tag, d, nb) =>
        println(s"--- $tag bloomx (files=$nb)")
        val keyed = d.select(col("doc_id"), col("text"),
          substring(col("text"), 1, 24).as("head24"))
        def manifestBytes(p: String): Long = {
          val f = new java.io.File(s"$p/_graft_log/v0.json")
          if (f.exists) f.length
          else new java.io.File(s"$p/_graft_log").listFiles()
            .map(_.length).sum
        }
        val pIn = s"/tmp/graft_scale_bloomin_$tag"
        val pEx = s"/tmp/graft_scale_bloomex_$tag"
        Seq(pIn, pEx).foreach(p =>
          org.apache.commons.io.FileUtils.deleteQuietly(
            new java.io.File(p)))
        timed("bloom_inline_write")(
          graft.sources.Merge.writeKeyed(keyed, pIn, "doc_id", nb,
            statsCols = Seq("doc_id", "bloom:head24")))
        timed("bloomx_write")(
          graft.sources.Merge.writeKeyed(keyed, pEx, "doc_id", nb,
            statsCols = Seq("doc_id", "bloomx:head24")))
        println(s"SCALE   manifest inline=${manifestBytes(pIn)} B " +
          s"external=${manifestBytes(pEx)} B")
        val probe = keyed.select("head24").limit(1).collect()(0)
          .getString(0)
        graft.sources.Skipping.bloomSidecarReads.set(0L)
        timed("bloomx_point_plan")({
          val (sel, total) = graft.sources.Merge.planVersionFiles(
            spark, pEx, 0L, Seq(graft.sources.Skipping.Bound(
              "head24", Some(probe), Some(probe))))
          println(s"SCALE   planned ${sel.size}/$total files, " +
            s"sidecar reads=" +
            graft.sources.Skipping.bloomSidecarReads.get())
        })
    }
    // ---- r18 GRID DML curve (VERDICT item 5): upsertGrid +
    // changesBetween off the toy slice. The cell-granular claim: a
    // FIXED-SIZE tuple batch rewrites files ∝ its touched CELLS and
    // commits bytes ∝ churn, whatever the table size — measured as
    // (cells touched, data files replaced, bytes of replaced files,
    // feed rows) at 1x and factor x with the grid scaled like the data.
    Seq(("1x", docs, 8), (s"${factor}x", inflated, 8 * factor))
      .foreach { case (tag, d, nTenant) =>
        println(s"--- $tag grid_dml (grid=${nTenant}x8)")
        val gp = s"/tmp/graft_scale_grid_$tag"
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(gp))
        val g = d.select((col("doc_id") % nTenant).as("tenant"),
          col("doc_id").as("id"), length(col("text")).cast("double").as("v"))
        timed("grid_write")(
          graft.sources.Merge.writeKeyedCols(g, gp,
            Seq("tenant", "id"), Seq(nTenant, 8)))
        def manifestFiles(): Map[String, Long] =
          graft.sources.Merge.filesInfo(spark, gp)
            .select("file", "bytes").collect()
            .map(r => r.getString(0) -> r.getLong(1)).toMap
        val before = manifestFiles()
        // the SAME 3-tuple batch at both scales
        val batch = Seq(
          (1L % nTenant, 1L, 111.0), (2L % nTenant, 2L, 222.0),
          ((nTenant - 1L) % nTenant, 900000001L, 1.0))
          .toDF("tenant", "id", "v")
        var st: graft.sources.Merge.MergeStats = null
        timed("grid_upsert_3tuples") {
          st = graft.sources.Merge.upsertGrid(spark, gp, batch)
        }
        val after = manifestFiles()
        val replaced = after.filterNot { case (f, sz) =>
          before.get(f).contains(sz) }
        println(s"SCALE   cells=${st.bucketsTouched}/${st.nBuckets} " +
          s"filesReplaced=${replaced.size}/${after.size} " +
          s"commitBytes=${replaced.values.sum}")
        var feed: Long = -1L
        timed("grid_changes_feed") {
          feed = graft.sources.Merge.changesBetween(spark, gp, 0L,
            st.version).count()
        }
        println(s"SCALE   feedRows=$feed")
      }

    // ---- r18 EXTERNAL RANGE STATS (statsx:): the bloomx manifest-size
    // curve for min/max entries — inline per-column stats vs ONE
    // sidecar ref per file, at 64 and 64×factor files, three stats
    // columns. The prune-parity claim lives in the q_statsx_skip gate;
    // here the claim is metadata bytes per commit.
    Seq(("1x", docs, 64), (s"${factor}x", inflated, 64 * factor))
      .foreach { case (tag, d, nb) =>
        println(s"--- $tag statsx (files=$nb)")
        val keyed = d.select(col("doc_id"), col("text"),
          length(col("text")).cast("long").as("len"),
          substring(col("text"), 1, 24).as("head24"))
        def manifestBytes(p: String): Long = {
          val f = new java.io.File(s"$p/_graft_log/v0.json")
          if (f.exists) f.length
          else new java.io.File(s"$p/_graft_log").listFiles()
            .map(_.length).sum
        }
        val pIn = s"/tmp/graft_scale_statsin_$tag"
        val pEx = s"/tmp/graft_scale_statsex_$tag"
        Seq(pIn, pEx).foreach(p =>
          org.apache.commons.io.FileUtils.deleteQuietly(
            new java.io.File(p)))
        timed("stats_inline_write")(
          graft.sources.Merge.writeKeyed(keyed, pIn, "doc_id", nb,
            statsCols = Seq("doc_id", "len", "head24")))
        timed("statsx_write")(
          graft.sources.Merge.writeKeyed(keyed, pEx, "doc_id", nb,
            statsCols = Seq("doc_id", "statsx:len", "statsx:head24")))
        println(s"SCALE   manifest inline=${manifestBytes(pIn)} B " +
          s"external=${manifestBytes(pEx)} B")
        graft.sources.Skipping.statsSidecarReads.set(0L)
        timed("statsx_range_plan")({
          val (sel, total) = graft.sources.Merge.planVersionFiles(
            spark, pEx, 0L, Seq(graft.sources.Skipping.Bound(
              "len", Some(0L), Some(10L))))
          println(s"SCALE   planned ${sel.size}/$total files, " +
            s"sidecar reads=" +
            graft.sources.Skipping.statsSidecarReads.get())
        })
      }
    // ---- r19 MANIFEST NDV (ndv:/ndvx:): the sketch-blob manifest-size
    // curve — inline ~1 KB blobs vs ONE ~40 B sidecar ref per file —
    // at 64 and 64×factor files, with the union answer pinned equal
    // across spec forms and the sidecar reads counted (≤ files once,
    // zero on repeat). The error contract lives in q_ndv_manifest;
    // here the claim is metadata bytes and read laziness.
    Seq(("1x", docs, 64), (s"${factor}x", inflated, 64 * factor))
      .foreach { case (tag, d, nb) =>
        println(s"--- $tag ndv (files=$nb)")
        val keyed = d.select(col("doc_id"), col("text"))
        def manifestBytes(p: String): Long = {
          val f = new java.io.File(s"$p/_graft_log/v0.json")
          if (f.exists) f.length
          else new java.io.File(s"$p/_graft_log").listFiles()
            .map(_.length).sum
        }
        val pIn = s"/tmp/graft_scale_ndvin_$tag"
        val pEx = s"/tmp/graft_scale_ndvex_$tag"
        Seq(pIn, pEx).foreach(p =>
          org.apache.commons.io.FileUtils.deleteQuietly(
            new java.io.File(p)))
        timed("ndv_inline_write")(
          graft.sources.Merge.writeKeyed(keyed, pIn, "doc_id", nb,
            statsCols = Seq("ndv:text")))
        timed("ndvx_write")(
          graft.sources.Merge.writeKeyed(keyed, pEx, "doc_id", nb,
            statsCols = Seq("ndvx:text")))
        println(s"SCALE   manifest inline=${manifestBytes(pIn)} B " +
          s"external=${manifestBytes(pEx)} B")
        graft.sources.Skipping.bloomSidecarReads.set(0L)
        timed("ndv_union")({
          val a = graft.sources.Merge.versionColumnNdv(
            spark, pIn, 0L, "text")
          val b = graft.sources.Merge.versionColumnNdv(
            spark, pEx, 0L, "text")
          require(a == b && a.nonEmpty,
            s"spec forms must answer identically: $a vs $b")
          println(s"SCALE   ndv=$a sidecar reads=" +
            graft.sources.Skipping.bloomSidecarReads.get())
        })
        timed("ndv_union_repeat")({
          graft.sources.Merge.versionColumnNdv(spark, pEx, 0L, "text")
          println(s"SCALE   repeat sidecar reads=" +
            graft.sources.Skipping.bloomSidecarReads.get())
        })
      }
    // ---- r19 PARTIAL ANN REBALANCE: repair cost ∝ drifted cells, not
    // corpus size. Build an IVF index (cells scale with the corpus),
    // drift a couple of cells with an appended cluster, then time the
    // drift-targeted partial rebalance against the full retrain+
    // reassign. The partial path samples, retrains, and re-stages only
    // the drifted cells' rows — flat as the corpus grows — while the
    // full rebalance re-stages everything and scales with the table.
    Seq(("1x", 1), (s"${factor}x", factor)).foreach { case (tag, f) =>
      val cells = 16 * f
      println(s"--- $tag ann_partial (cells=$cells)")
      val e =
        if (f == 1) emb
        else emb.crossJoin(spark.range(f).toDF("copy"))
          .select((col("vec_id") * f + col("copy")).as("vec_id"),
            transform(col("embedding"),
              x => x + (col("copy") % 7).cast("float") * lit(0.01f))
              .cast("array<float>").as("embedding"))
      val path = s"/tmp/graft_scale_annp_$tag"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
      timed("ivf_build")(Similarity.IvfIndex.build(
        e, "vec_id", "embedding", cells, path))
      // drift: a tight appended cluster between two centroids — lands
      // in a couple of cells whatever the corpus size
      val cents = Similarity.IvfIndex.loadCentroids(spark, path)
      val dim = cents(0).length
      val d0 = cents(0).zip(cents(1)).map { case (a, b) => a + b }
      val nrm = math.sqrt(d0.map(x => x * x).sum)
      val dvec = d0.map(x => (x / nrm).toFloat).toSeq
      val drift = (0L until 200L).map { j =>
        (9000000L + j, dvec.zipWithIndex.map { case (x, i) =>
          if (i == (j % dim).toInt) x + 0.002f else x })
      }.toDF("vec_id", "embedding")
      Similarity.IvfIndex.append(spark, path, drift, "vec_id", "embedding")
      val worst = Similarity.IvfIndex
        .driftStatsPerCell(spark, path, "embedding")
        .sortBy(_._3).take(2).map(_._1)
      val corpusFiles = graft.sources.TxLog.currentState(spark, path)
        .get.tables("corpus").size
      timed("rebalance_partial_2cells")(
        Similarity.IvfIndex.rebalancePartial(spark, path, "vec_id",
          "embedding", worst))
      val kept = graft.sources.TxLog.currentState(spark, path)
        .get.tables("corpus").size
      println(s"SCALE   drifted=${worst.mkString(",")} " +
        s"files_before=$corpusFiles files_after=$kept")
      timed("rebalance_full")(
        Similarity.IvfIndex.rebalance(spark, path, "vec_id", "embedding"))
    }

    spark.stop()
  }
}
