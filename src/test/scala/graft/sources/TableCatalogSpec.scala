package graft.sources

import java.io.File
import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Multi-table atomic transactions: all-or-nothing visibility through
  * the catalog, crash-orphan rollback, optimistic serialization of
  * racing transactions, and pin-safe vacuum — the cross-table
  * guarantees no single member log can give.
  */
class TableCatalogSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): File = {
    val d = Files.createTempDirectory(s"graft_cat_spec_$tag").toFile
    d.deleteOnExit()
    d
  }

  /** Two members: accounts(id, balance) and audit(id, total_moves). */
  private def fixture(tag: String): (String, String, String) = {
    val root = freshRoot(tag)
    val accounts = new File(root, "accounts").getAbsolutePath
    val audit = new File(root, "audit").getAbsolutePath
    val cat = new File(root, "cat").getAbsolutePath
    Merge.writeKeyed((0L until 20L).map(i => (i, 100.0 * i))
      .toDF("id", "balance"), accounts, "id", nBuckets = 4)
    Merge.writeKeyed(Seq((0L, 0L)).toDF("id", "total_moves"),
      audit, "id", nBuckets = 2)
    TableCatalog.create(spark, cat,
      Map("accounts" -> accounts, "audit" -> audit))
    (cat, accounts, audit)
  }

  private def balances(cat: String): Map[Long, Double] =
    TableCatalog.readTable(spark, cat, "accounts")
      .select("id", "balance").as[(Long, Double)].collect().toMap

  private def moves(cat: String): Long =
    TableCatalog.readTable(spark, cat, "audit")
      .filter($"id" === 0L).select("total_moves").as[Long].head()

  test("transact applies every op and publishes them together") {
    val (cat, _, _) = fixture("apply")
    val st = TableCatalog.transact(spark, cat, Seq(
      TableCatalog.TxnUpsert("accounts",
        Seq((3L, 999.0), (50L, 42.0)).toDF("id", "balance")),
      TableCatalog.TxnUpsert("audit", Seq((0L, 1L)).toDF("id", "total_moves")),
      TableCatalog.TxnDelete("accounts", col("id") === 7L)))
    assert(st.version == 1L && st.op == "transact")
    val b = balances(cat)
    assert(b(3L) == 999.0 && b(50L) == 42.0 && !b.contains(7L) &&
      b.size == 20 && moves(cat) == 1L)
    // one snapshot resolution serves multiple members consistently
    val snap = TableCatalog.state(spark, cat)
    assert(TableCatalog.readTable(spark, cat, "audit", Some(snap))
      .count() == 1L)
  }

  test("a crash between table commits stays invisible; recover rolls back") {
    val (cat, accounts, _) = fixture("crash")
    val boom = new RuntimeException("crash after first table op")
    TableCatalog.opFence = t => if (t == "accounts") throw boom
    val thrown = intercept[RuntimeException] {
      TableCatalog.transact(spark, cat, Seq(
        TableCatalog.TxnUpsert("accounts",
          Seq((1L, -1.0)).toDF("id", "balance")),
        TableCatalog.TxnUpsert("audit",
          Seq((0L, 99L)).toDF("id", "total_moves"))))
    }
    TableCatalog.opFence = _ => ()
    assert(thrown eq boom)
    // the half-applied accounts version exists on the member log...
    assert(Merge.currentVersion(spark, accounts) == 1L)
    assert(Merge.readKeyed(spark, accounts).filter($"id" === 1L)
      .select("balance").as[Double].head() == -1.0)
    // ...but the catalog shows the pre-transaction state of BOTH tables
    assert(TableCatalog.state(spark, cat).version == 0L)
    assert(balances(cat)(1L) == 100.0 && moves(cat) == 0L)
    // recover restores the member log to the pin (direct readers converge)
    assert(TableCatalog.recover(spark, cat) == Seq("accounts"))
    assert(Merge.readKeyed(spark, accounts).filter($"id" === 1L)
      .select("balance").as[Double].head() == 100.0)
    // and a later transaction applies cleanly on the published state
    TableCatalog.transact(spark, cat, Seq(
      TableCatalog.TxnUpsert("accounts",
        Seq((1L, 111.0)).toDF("id", "balance")),
      TableCatalog.TxnUpsert("audit",
        Seq((0L, 1L)).toDF("id", "total_moves"))))
    assert(balances(cat)(1L) == 111.0 && moves(cat) == 1L)
  }

  test("an orphan from a crashed transact is discarded by the next one") {
    val (cat, accounts, _) = fixture("orphan")
    // simulate the crash by mutating the member directly (what a dead
    // transaction leaves behind): NOT a catalog write
    Merge.upsert(spark, accounts, Seq((2L, -2.0)).toDF("id", "balance"),
      "id", nBuckets = 4)
    assert(balances(cat)(2L) == 200.0, "catalog read must ignore the orphan")
    TableCatalog.transact(spark, cat, Seq(
      TableCatalog.TxnUpsert("accounts",
        Seq((5L, 555.0)).toDF("id", "balance"))))
    val b = balances(cat)
    assert(b(5L) == 555.0)
    assert(b(2L) == 200.0,
      "the published pin must not smuggle the orphan's write")
  }

  test("racing transactions serialize: loser redoes on the winner's pins") {
    val (cat, _, _) = fixture("race")
    // the first claim attempt loses: a competing transaction commits the
    // same catalog version underneath it
    var injected = false
    TableCatalog.catFence = () => {
      if (!injected) {
        injected = true
        val fence = TableCatalog.catFence
        TableCatalog.catFence = () => ()
        try TableCatalog.transact(spark, cat, Seq(
          TableCatalog.TxnUpsert("accounts",
            Seq((10L, 1010.0)).toDF("id", "balance"))))
        finally TableCatalog.catFence = fence
      }
    }
    try {
      TableCatalog.transact(spark, cat, Seq(
        TableCatalog.TxnUpsert("accounts",
          Seq((11L, 1111.0)).toDF("id", "balance")),
        TableCatalog.TxnUpsert("audit",
          Seq((0L, 1L)).toDF("id", "total_moves"))))
    } finally TableCatalog.catFence = () => ()
    val b = balances(cat)
    assert(b(10L) == 1010.0, "the winner's write survives")
    assert(b(11L) == 1111.0 && moves(cat) == 1L,
      "the loser's whole transaction lands after redo")
    assert(TableCatalog.state(spark, cat).version == 2L)
  }

  test("catalog time travel: stateAt/stateAsOf pin every member at once") {
    val (cat, _, _) = fixture("tt")
    TableCatalog.transact(spark, cat, Seq(
      TableCatalog.TxnUpsert("accounts",
        Seq((4L, 4.0)).toDF("id", "balance")),
      TableCatalog.TxnUpsert("audit",
        Seq((0L, 1L)).toDF("id", "total_moves"))))
    val v0 = TableCatalog.stateAt(spark, cat, 0L)
    assert(TableCatalog.readTable(spark, cat, "accounts", Some(v0))
      .filter($"id" === 4L).select("balance").as[Double].head() == 400.0)
    assert(TableCatalog.readTable(spark, cat, "audit", Some(v0))
      .select("total_moves").as[Long].head() == 0L)
    val t1 = TableCatalog.state(spark, cat).ts
    assert(TableCatalog.stateAsOf(spark, cat, t1).version == 1L)
    assert(TableCatalog.stateAsOf(spark, cat, t1 - 1).version == 0L)
    val h = TableCatalog.history(spark, cat)
    assert(h.count() == 4L) // 2 catalog versions x 2 member pins
    assert(h.filter($"cat_version" === 1L && $"table" === "accounts")
      .select("table_version").as[Long].head() == 1L)
  }

  test("vacuum keeps every pinned member version readable") {
    val (cat, accounts, _) = fixture("vac")
    for (i <- 1 to 3)
      TableCatalog.transact(spark, cat, Seq(
        TableCatalog.TxnUpsert("accounts",
          Seq((i.toLong, i * 1.0)).toDF("id", "balance"))))
    // leave an orphan ABOVE the pin, then vacuum: the pinned version's
    // files must survive even though the member log's latest is the orphan
    Merge.upsert(spark, accounts, Seq((0L, -0.5)).toDF("id", "balance"),
      "id", nBuckets = 4)
    TableCatalog.vacuum(spark, cat, keepCatalogVersions = 2)
    val b = balances(cat)
    assert(b(3L) == 3.0 && b(0L) == 0.0 && b.size == 20)
    // the retained previous catalog version still reads consistently
    val prev = TableCatalog.stateAt(spark, cat,
      TableCatalog.state(spark, cat).version - 1)
    assert(TableCatalog.readTable(spark, cat, "accounts", Some(prev))
      .filter($"id" === 3L).select("balance").as[Double].head() == 300.0)
  }

  test("catalog tags: named cross-table snapshots survive vacuum") {
    val (cat, _, _) = fixture("tags")
    TableCatalog.transact(spark, cat, Seq(
      TableCatalog.TxnUpsert("accounts",
        Seq((3L, 999.0)).toDF("id", "balance")),
      TableCatalog.TxnUpsert("audit",
        Seq((0L, 1L)).toDF("id", "total_moves"))))
    TableCatalog.tag(spark, cat, "rel-1", 1L)
    intercept[IllegalArgumentException] {
      TableCatalog.tag(spark, cat, "rel-1", 0L) // immutable
    }
    intercept[IllegalArgumentException] {
      TableCatalog.tag(spark, cat, "bad name", 1L)
    }
    TableCatalog.transact(spark, cat, Seq(
      TableCatalog.TxnUpsert("accounts",
        Seq((3L, 111.0)).toDF("id", "balance")),
      TableCatalog.TxnUpsert("audit",
        Seq((0L, 2L)).toDF("id", "total_moves"))))
    TableCatalog.transact(spark, cat, Seq(
      TableCatalog.TxnUpsert("accounts",
        Seq((4L, 222.0)).toDF("id", "balance")),
      TableCatalog.TxnUpsert("audit",
        Seq((0L, 3L)).toDF("id", "total_moves"))))
    assert(TableCatalog.tags(spark, cat).as[(String, Long)]
      .collect().toSeq == Seq(("rel-1", 1L)))
    TableCatalog.vacuum(spark, cat, keepCatalogVersions = 1)
    // untagged v2 is unreadable, the tagged snapshot answers — BOTH
    // members, at their tagged pins
    intercept[Exception] { TableCatalog.stateAt(spark, cat, 2L) }
    val rel = TableCatalog.stateAtTag(spark, cat, "rel-1")
    val b = TableCatalog.readTable(spark, cat, "accounts", Some(rel))
      .select("id", "balance").as[(Long, Double)].collect().toMap
    assert(b(3L) == 999.0)
    assert(TableCatalog.readTable(spark, cat, "audit", Some(rel))
      .filter($"id" === 0L).select("total_moves").as[Long].head() == 1L)
    // drop the tag: the next vacuum reclaims the snapshot
    TableCatalog.deleteTag(spark, cat, "rel-1")
    TableCatalog.vacuum(spark, cat, keepCatalogVersions = 1)
    intercept[Exception] {
      TableCatalog.stateAtTag(spark, cat, "rel-1")
    }
  }

  test("txn-stamped transactions are exactly-once under replay") {
    val (cat, _, _) = fixture("txn")
    def applyBatch(batch: Long): Unit =
      TableCatalog.transact(spark, cat, Seq(
        TableCatalog.TxnUpsert("accounts",
          Seq((batch, batch * 1.0)).toDF("id", "balance")),
        TableCatalog.TxnUpsert("audit",
          Seq((0L, batch)).toDF("id", "total_moves"))),
        txn = Some(("app", batch)))
    applyBatch(1); applyBatch(2)
    val v = TableCatalog.state(spark, cat).version
    val balBefore = balances(cat)
    // checkpoint-lost replay: both batches re-arrive and must no-op on
    // EVERY member at once
    applyBatch(1); applyBatch(2)
    assert(TableCatalog.state(spark, cat).version == v &&
      balances(cat) == balBefore && moves(cat) == 2L)
    assert(TableCatalog.latestTxn(spark, cat, "app").contains(2L))
    assert(TableCatalog.latestTxn(spark, cat, "other").isEmpty)
    applyBatch(3) // the next genuine batch still lands
    assert(TableCatalog.state(spark, cat).version == v + 1 &&
      moves(cat) == 3L)
  }

  test("index members: corpus and dedup index publish atomically") {
    import graft.pipeline.DedupIndex
    val root = freshRoot("idx")
    val corpusPath = new java.io.File(root, "corpus").getAbsolutePath
    val idxPath = new java.io.File(root, "idx").getAbsolutePath
    val cat = new java.io.File(root, "cat").getAbsolutePath
    def text(tag: String): String =
      (0 until 12).map(j => s"${tag}_w$j").mkString(" ")
    val corpus0 = Seq((1L, text("t1")), (2L, text("t2")))
      .toDF("doc_id", "text")
    Merge.writeKeyed(corpus0, corpusPath, "doc_id", nBuckets = 4)
    DedupIndex.build(corpus0, "doc_id", col("text"), idxPath,
      threshold = 0.8)
    TableCatalog.create(spark, cat, Map("corpus" -> corpusPath),
      indexes = Map("idx" -> idxPath))

    def admit(batch: org.apache.spark.sql.DataFrame): Unit = {
      val st = TableCatalog.indexState(spark, cat, "idx")
      val surv = DedupIndex.dedupAgainst(spark, idxPath, batch,
        "doc_id", col("text"), at = Some(st)).localCheckpoint(true)
      TableCatalog.transact(spark, cat, Seq(
        TableCatalog.TxnUpsert("corpus", surv),
        TableCatalog.TxnIndex("idx", (s, p) =>
          DedupIndex.append(s, p, surv, "doc_id", col("text")))))
    }
    // batch 1: a copy of doc 1 (drops) + fresh t3 (admitted)
    admit(Seq((101L, text("t1")), (102L, text("t3"))).toDF("doc_id", "text"))
    def corpusIds: Set[Long] =
      TableCatalog.readTable(spark, cat, "corpus")
        .select("doc_id").as[Long].collect().toSet
    assert(corpusIds == Set(1L, 2L, 102L))
    // batch 2: a copy of batch 1's SURVIVOR must now be dominated —
    // proof the index append published with the corpus rows
    admit(Seq((201L, text("t3")), (202L, text("t4"))).toDF("doc_id", "text"))
    assert(corpusIds == Set(1L, 2L, 102L, 202L))

    // a crash between the corpus commit and the index commit leaves the
    // catalog unchanged; recover rolls the corpus member back
    TableCatalog.opFence =
      t => if (t == "corpus") throw new RuntimeException("boom")
    val before = TableCatalog.state(spark, cat).version
    try intercept[RuntimeException] {
      admit(Seq((301L, text("t5"))).toDF("doc_id", "text"))
    } finally TableCatalog.opFence = _ => ()
    assert(TableCatalog.state(spark, cat).version == before &&
      corpusIds == Set(1L, 2L, 102L, 202L))
    assert(TableCatalog.recover(spark, cat) == Seq("corpus"))

    // an orphan index append (outside the catalog) must not suppress
    // admissions: the pinned probe ignores it, and the next transact
    // rolls the index member back to its pin
    DedupIndex.append(spark, idxPath,
      Seq((999L, text("t6"))).toDF("doc_id", "text"), "doc_id", col("text"))
    admit(Seq((401L, text("t6"))).toDF("doc_id", "text"))
    assert(corpusIds == Set(1L, 2L, 102L, 202L, 401L),
      "the orphan append must not have suppressed t6's admission")

    // structural consistency: a shifted copy of EVERY corpus row is
    // dominated by the pinned index — index coverage == corpus content
    val copies = TableCatalog.readTable(spark, cat, "corpus")
      .select((col("doc_id") + 10000L).as("doc_id"), col("text"))
    val dominated = DedupIndex.dominatedBy(spark, idxPath, copies,
      "doc_id", col("text"))
    assert(dominated.count() == 5L,
      "every corpus doc must be covered by the published index")
  }

  test("read-modify-write transactions recompute after a lost race " +
      "(no lost update)") {
    val (cat, _, _) = fixture("rmw")
    def incOps(st: TableCatalog.CatState): Seq[TableCatalog.TxnOp] = {
      val cur = TableCatalog.readTable(spark, cat, "audit", Some(st))
        .filter($"id" === 0L).select("total_moves").as[Long].head()
      Seq(TableCatalog.TxnUpsert("audit",
        Seq((0L, cur + 1L)).toDF("id", "total_moves")))
    }
    // a competing increment lands between this transaction's read and
    // its claim: the loser must RE-READ and re-derive, not republish
    // its stale cur+1
    var injected = false
    TableCatalog.catFence = () => {
      if (!injected) {
        injected = true
        val fence = TableCatalog.catFence
        TableCatalog.catFence = () => ()
        try TableCatalog.transactWith(spark, cat, incOps)
        finally TableCatalog.catFence = fence
      }
    }
    try TableCatalog.transactWith(spark, cat, incOps)
    finally TableCatalog.catFence = () => ()
    assert(moves(cat) == 2L,
      "both increments must land — a lost race may not lose an update")
  }

  test("member maintenance rides a transaction (TxnTable); direct " +
      "maintenance is discarded as an orphan") {
    val (cat, accounts, _) = fixture("maint")
    (1 to 3).foreach { i =>
      TableCatalog.transact(spark, cat, Seq(
        TableCatalog.TxnUpsert("accounts",
          Seq((1L, i * 1.0)).toDF("id", "balance"))))
    }
    val before = balances(cat)
    // a clustering OPTIMIZE always rewrites — the maintenance commit
    // rides the transaction like any data commit
    TableCatalog.transact(spark, cat, Seq(
      TableCatalog.TxnTable("accounts", (s, p) =>
        Merge.compactVersion(s, p, targetFilesPerBucket = 1,
          clusterBy = Seq("balance")).version)))
    assert(balances(cat) == before, "compaction never changes rows")
    assert(Merge.history(spark, accounts).orderBy(desc("version"))
      .select("op").as[String].head() == "compact")
    // DIRECT maintenance outside a transaction is an orphan: the next
    // transact rolls it back (that is the documented contract)
    Merge.addConstraint(spark, accounts, "bal_notnull",
      "balance IS NOT NULL")
    TableCatalog.transact(spark, cat, Seq(
      TableCatalog.TxnUpsert("accounts",
        Seq((2L, 2.0)).toDF("id", "balance"))))
    assert(Merge.tableConstraints(spark, accounts).isEmpty,
      "the direct addConstraint must have been rolled back")
    // through a transaction it sticks — and then gates later
    // transactions: a violating batch fails the WHOLE transaction
    TableCatalog.transact(spark, cat, Seq(
      TableCatalog.TxnTable("accounts", (s, p) =>
        Merge.addConstraint(s, p, "bal_notnull", "balance IS NOT NULL"))))
    assert(Merge.tableConstraints(spark, accounts).nonEmpty)
    val vBefore = TableCatalog.state(spark, cat).version
    intercept[Merge.ConstraintViolation] {
      TableCatalog.transact(spark, cat, Seq(
        TableCatalog.TxnUpsert("accounts",
          Seq((3L, Option.empty[Double])).toDF("id", "balance")),
        TableCatalog.TxnUpsert("audit",
          Seq((0L, 99L)).toDF("id", "total_moves"))))
    }
    assert(TableCatalog.state(spark, cat).version == vBefore &&
      moves(cat) == 0L,
      "a constraint violation aborts the whole transaction")
  }

  test("member evolution: addMember/removeMember are catalog commits " +
      "with working time travel") {
    val (cat, _, _) = fixture("evolve")
    val extra = new File(freshRoot("evolve_extra"), "extra").getAbsolutePath
    Merge.writeKeyed(Seq((1L, "x")).toDF("id", "tag"), extra, "id",
      nBuckets = 2)
    val vBefore = TableCatalog.state(spark, cat).version
    TableCatalog.addMember(spark, cat, "extra", extra)
    intercept[IllegalArgumentException] {
      TableCatalog.addMember(spark, cat, "extra", extra) // duplicate
    }
    // the new member participates in transactions with the old ones
    TableCatalog.transact(spark, cat, Seq(
      TableCatalog.TxnUpsert("extra", Seq((2L, "y")).toDF("id", "tag")),
      TableCatalog.TxnUpsert("audit",
        Seq((0L, 1L)).toDF("id", "total_moves"))))
    assert(TableCatalog.readTable(spark, cat, "extra").count() == 2L)
    // time travel to before the add: the member does not exist there
    val old = TableCatalog.stateAt(spark, cat, vBefore)
    intercept[IllegalArgumentException] {
      TableCatalog.readTable(spark, cat, "extra", Some(old))
    }
    TableCatalog.removeMember(spark, cat, "extra")
    intercept[IllegalArgumentException] {
      TableCatalog.readTable(spark, cat, "extra")
    }
    // the dropped member's own data is untouched, and the retained
    // pre-remove catalog version still resolves it
    assert(Merge.readKeyed(spark, extra).count() == 2L)
    val preRemove = TableCatalog.stateAt(spark, cat,
      TableCatalog.state(spark, cat).version - 1)
    assert(TableCatalog.readTable(spark, cat, "extra", Some(preRemove))
      .count() == 2L)
  }

  test("STRESS: genuinely concurrent read-modify-write transactions " +
      "serialize (threads, not fences)") {
    val (cat, _, _) = fixture("stress")
    def incOps(st: TableCatalog.CatState): Seq[TableCatalog.TxnOp] = {
      val cur = TableCatalog.readTable(spark, cat, "audit", Some(st))
        .filter($"id" === 0L).select("total_moves").as[Long].head()
      Seq(TableCatalog.TxnUpsert("audit",
        Seq((0L, cur + 1L)).toDF("id", "total_moves")))
    }
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 3).map(_ => new Thread(() => {
      try (1 to 3).foreach { _ =>
        TableCatalog.transactWith(spark, cat, incOps, maxRetries = 300)
      } catch { case t: Throwable => errs.add(t) }
    }))
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"no transaction may fail: ${errs.peek()}")
    assert(moves(cat) == 9L, "every increment lands exactly once")
    assert(TableCatalog.state(spark, cat).version == 9L,
      "nine transactions -> nine catalog versions")
  }

  test("an ANN index member: vectors and IVF-PQ codes publish atomically") {
    import graft.pipeline.Similarity
    def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray
    val root = freshRoot("ann")
    val vecPath = new java.io.File(root, "vecs").getAbsolutePath
    val annPath = new java.io.File(root, "ann").getAbsolutePath
    val cat = new java.io.File(root, "cat").getAbsolutePath
    val pts = Seq(
      (1L, vec(1, 0, 1, 0)), (2L, vec(0.9, 0, 0.9, 0)),
      (3L, vec(0, 1, 0, 1)), (4L, vec(0, 0.9, 0, 0.9)))
      .toDF("vec_id", "embedding")
    Merge.writeKeyed(pts, vecPath, "vec_id", nBuckets = 2)
    Similarity.IvfPq.save(Similarity.IvfPq.build(pts, "vec_id",
      "embedding", dim = 4, cells = 2, m = 2, kSub = 4, sampleN = 100,
      iters = 5), annPath)
    TableCatalog.create(spark, cat, Map("vecs" -> vecPath),
      indexes = Map("ann" -> annPath))
    val q1 = pts.filter($"vec_id" === 1L)
    def probe(k: Int): Seq[Long] = {
      val st = TableCatalog.indexState(spark, cat, "ann")
      Similarity.IvfPq.topKPersisted(spark, annPath, q1, "vec_id",
        "embedding", k = k, nProbe = 2, at = Some(st))
        .orderBy(col("rank")).select("neighbor_id").as[Long].collect().toSeq
    }
    // a new vector lands in the Merge table AND the codes table behind
    // one claim (the same TxnIndex contract as the dedup index)
    val batch = Seq((10L, vec(1, 0, 1, 0))).toDF("vec_id", "embedding")
    TableCatalog.transact(spark, cat, Seq(
      TableCatalog.TxnUpsert("vecs", batch),
      TableCatalog.TxnIndex("ann", (s, p) =>
        Similarity.IvfPq.append(batch, "vec_id", "embedding", p))))
    assert(probe(1).head == 10L, "the appended exact copy must rank first")
    // an orphan append outside the catalog stays invisible to pinned probes
    Similarity.IvfPq.append(Seq((99L, vec(1, 0, 1, 0)))
      .toDF("vec_id", "embedding"), "vec_id", "embedding", annPath)
    assert(!probe(10).contains(99L), "the orphan append must not show")
    // atomic retire: delete the vector row + tombstone its codes in ONE
    // transaction (the orphan is rolled back by the same transact)
    TableCatalog.transact(spark, cat, Seq(
      TableCatalog.TxnDelete("vecs", col("vec_id") === 10L),
      TableCatalog.TxnIndex("ann", (s, p) =>
        Similarity.IvfPq.remove(Seq(10L).toDF("vec_id"), "vec_id", p))))
    val ids = probe(10)
    assert(!ids.contains(10L) && !ids.contains(99L))
    assert(ids.head == 1L || ids.head == 2L)
    assert(TableCatalog.readTable(spark, cat, "vecs")
      .select("vec_id").as[Long].collect().toSet == Set(1L, 2L, 3L, 4L))
  }

  test("PROPERTY: random transact/crash/orphan/replay/recover sequences " +
      "match a two-member reference model, at every catalog version") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val genOp: Gen[(Int, Long, Double)] = for {
      kind <- Gen.choose(0, 4)
      key <- Gen.choose(0L, 30L)
      v <- Gen.choose(-100.0, 100.0)
    } yield (kind, key, v)
    (1 to 4).foreach { seed =>
      val root = freshRoot(s"model$seed")
      val aPath = new java.io.File(root, "a").getAbsolutePath
      val bPath = new java.io.File(root, "b").getAbsolutePath
      val cat = new java.io.File(root, "cat").getAbsolutePath
      val ma = scala.collection.mutable.Map.empty[Long, Double]
      val mb = scala.collection.mutable.Map.empty[Long, Double]
      (0L until 20L).foreach { i => ma(i) = i * 1.0; mb(i) = i * 10.0 }
      Merge.writeKeyed(ma.toSeq.toDF("id", "v"), aPath, "id", nBuckets = 4)
      Merge.writeKeyed(mb.toSeq.toDF("id", "v"), bPath, "id", nBuckets = 4)
      TableCatalog.create(spark, cat, Map("a" -> aPath, "b" -> bPath))
      val snapshots = scala.collection.mutable.ArrayBuffer(
        (0L, ma.toMap, mb.toMap))
      var nextBatch = 0L
      val ops = Gen.listOfN(8, genOp)
        .apply(Gen.Parameters.default, Seed(seed.toLong)).get
      ops.foreach { case (kind, key, v) =>
        kind match {
          case 0 => // cross-table upsert, txn-stamped
            TableCatalog.transact(spark, cat, Seq(
              TableCatalog.TxnUpsert("a", Seq((key, v)).toDF("id", "v")),
              TableCatalog.TxnUpsert("b",
                Seq((key + 1L, v * 2)).toDF("id", "v"))),
              txn = Some(("app", nextBatch)))
            nextBatch += 1
            ma(key) = v; mb(key + 1L) = v * 2
          case 1 => // predicate delete on a + upsert on b, one txn
            TableCatalog.transact(spark, cat, Seq(
              TableCatalog.TxnDelete("a", $"v" > v),
              TableCatalog.TxnUpsert("b", Seq((key, v)).toDF("id", "v"))))
            ma.filterInPlace((_, mv) => !(mv > v))
            mb(key) = v
          case 2 => // crash between the two table commits: no effect
            TableCatalog.opFence =
              t => if (t == "a") throw new RuntimeException("boom")
            try intercept[RuntimeException] {
              TableCatalog.transact(spark, cat, Seq(
                TableCatalog.TxnUpsert("a",
                  Seq((key, -555.0)).toDF("id", "v")),
                TableCatalog.TxnUpsert("b",
                  Seq((key, -555.0)).toDF("id", "v"))))
            } finally TableCatalog.opFence = _ => ()
            if (v > 0) TableCatalog.recover(spark, cat) // sometimes clean up
          case 3 => // direct (non-catalog) orphan write: invisible
            Merge.upsert(spark, aPath,
              Seq((key, -777.0)).toDF("id", "v"), "id", nBuckets = 4)
          case 4 => // replay of an already-committed batch: no-op
            if (nextBatch > 0) {
              TableCatalog.transact(spark, cat, Seq(
                TableCatalog.TxnUpsert("a",
                  Seq((key, -999.0)).toDF("id", "v"))),
                txn = Some(("app", (key % nextBatch))))
            }
        }
        val st = TableCatalog.state(spark, cat)
        if (st.version != snapshots.last._1)
          snapshots += ((st.version, ma.toMap, mb.toMap))
        def rows(name: String): Map[Long, Double] =
          TableCatalog.readTable(spark, cat, name, Some(st))
            .select("id", "v").as[(Long, Double)].collect().toMap
        assert(rows("a") == ma.toMap,
          s"seed $seed: member a diverged after ($kind,$key,$v) in $ops")
        assert(rows("b") == mb.toMap,
          s"seed $seed: member b diverged after ($kind,$key,$v) in $ops")
      }
      // every catalog version still reads its own cross-table snapshot
      snapshots.foreach { case (cv, sa, sb) =>
        val st = TableCatalog.stateAt(spark, cat, cv)
        def rows(name: String): Map[Long, Double] =
          TableCatalog.readTable(spark, cat, name, Some(st))
            .select("id", "v").as[(Long, Double)].collect().toMap
        assert(rows("a") == sa && rows("b") == sb,
          s"seed $seed: catalog v$cv diverged")
      }
    }
  }

  test("readTableWhere prunes through the pin; layout drives the upsert") {
    val (cat, accounts, _) = fixture("where")
    assert(Merge.tableLayout(spark, accounts).contains(("id", 4)))
    val got = TableCatalog.readTableWhere(spark, cat, "accounts",
      col("id") === 13L)
    assert(got.select("balance").as[Double].head() == 1300.0)
    intercept[IllegalArgumentException] {
      TableCatalog.readTable(spark, cat, "nope")
    }
  }
}
