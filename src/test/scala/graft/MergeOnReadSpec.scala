package graft

import org.apache.spark.sql.functions._
import graft.operators.MergeOnRead

/** Merge-on-read on sf0.001: the scalable resolve (log-only window +
  * broadcast anti-join) is row-identical to the canonical
  * row_number-over-union form; the log is a REAL multi-batch streaming
  * artifact; tombstones drop; compaction folds losslessly. */
class MergeOnReadSpec extends SparkSpec {
  import spark.implicits._

  private def hex(k: Long): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(k.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 1)

  test("scalable resolve ≡ canonical row_number-over-union resolve") {
    val fast = MergeOnRead.snapshot(spark, sf0001)
      .collect().map(_.toSeq).toSet
    val canonical = MergeOnRead.snapshotViaUnionWindow(spark, sf0001)
      .collect().map(_.toSeq).toSet
    assert(fast == canonical,
      s"diff: +${(fast -- canonical).take(2)} -${(canonical -- fast).take(2)}")
  }

  test("the log is a real multi-batch stream artifact; base is untouched") {
    val log = spark.read.parquet(MergeOnRead.deltaLogDir(spark, sf0001))
    // one sink batch per feed file, each appended with its batch id
    assert(log.select("_batch_id").distinct().count() == 3)
    // every (key, seq) version appears exactly once (idempotent append)
    assert(log.groupBy("o_orderkey", "_seq").count()
      .filter($"count" > 1).count() == 0)
    // base is the ORIGINAL testdata file — merge-on-read reads it in
    // place; nothing was written next to it
    val baseDir = new java.io.File(s"$sf0001")
    assert(baseDir.listFiles.map(_.getName).count(_.contains("orders")) == 1)
  }

  test("latest-version-wins and tombstones, checked per hex class") {
    val snap = MergeOnRead.snapshot(spark, sf0001)
      .withColumn("hx", substring(md5($"o_orderkey".cast("string")), 1, 1))
    // hex 0-1: three versions logged, seq 2 must win
    val h01 = snap.filter($"hx".isin("0", "1"))
      .select("o_orderstatus").distinct().as[String].collect().toSet
    assert(h01 == Set("U2"), h01.toString)
    // hex 2-3 → U1, hex 4-7 → U0
    assert(snap.filter($"hx".isin("2", "3")).select("o_orderstatus")
      .distinct().as[String].collect().toSet == Set("U1"))
    assert(snap.filter($"hx".isin("4", "5", "6", "7"))
      .select("o_orderstatus").distinct().as[String].collect().toSet ==
      Set("U0"))
    // tombstoned keys are GONE
    assert(snap.filter($"hx".isin(MergeOnRead.DeleteHex: _*)).count() == 0)
    // untouched keys keep their original row verbatim
    val orig = Tables(spark, sf0001, "orders")
      .withColumn("hx", substring(md5($"o_orderkey".cast("string")), 1, 1))
      .filter(!$"hx".isin(('0' to '7').map(_.toString) ++
        MergeOnRead.DeleteHex: _*))
    val kept = snap.filter(!$"hx".isin(('0' to '7').map(_.toString) ++
      MergeOnRead.DeleteHex: _*))
    assert(kept.drop("hx").collect().map(_.toSeq).toSet ==
      orig.drop("hx").collect().map(_.toSeq).toSet)
    // row accounting: |snapshot| = |orders| - |tombstoned keys|
    val nDel = Tables(spark, sf0001, "orders").filter(
      substring(md5($"o_orderkey".cast("string")), 1, 1)
        .isin(MergeOnRead.DeleteHex: _*)).count()
    assert(snap.count() == Tables(spark, sf0001, "orders").count() - nDel)
  }

  test("compaction folds the log losslessly: pre/post reads agree") {
    val pre = MergeOnRead.ordersMergeOnRead(spark, sf0001)
      .collect().map(_.toSeq)
    val post = MergeOnRead.ordersMorCompacted(spark, sf0001)
      .collect().map(_.toSeq)
    assert(pre.sameElements(post))
    // the folded copy is range-sorted on the key: per-file ranges are
    // disjoint (the zone-map layout)
    val byFile = spark.read.parquet(MergeOnRead.compactedDir(spark, sf0001))
      .groupBy(input_file_name().as("f"))
      .agg(min("o_orderkey").as("lo"), max("o_orderkey").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    byFile.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2, byFile.mkString(","))
      case _ => ()
    }
  }

  test("time travel: as-of reads walk the version history") {
    // seq 2 = current; seq 1 hides the last batch's upserts AND
    // tombstones; seq -1 (before any log) = the base table verbatim
    val current = MergeOnRead.snapshot(spark, sf0001)
      .collect().map(_.toSeq).toSet
    val atSeq2 = MergeOnRead.snapshotAt(spark, sf0001, 2L)
      .collect().map(_.toSeq).toSet
    assert(atSeq2 == current)
    val atSeq1 = MergeOnRead.snapshotAt(spark, sf0001, 1L)
      .withColumn("hx", substring(md5($"o_orderkey".cast("string")), 1, 1))
    // hex 0-1's seq-2 version is invisible: they read U1, not U2
    assert(atSeq1.filter($"hx".isin("0", "1")).select("o_orderstatus")
      .distinct().as[String].collect().toSet == Set("U1"))
    // tombstones (seq 2) have not happened yet
    assert(atSeq1.filter($"hx".isin(MergeOnRead.DeleteHex: _*)).count() > 0)
    val atStart = MergeOnRead.snapshotAt(spark, sf0001, -1L)
      .collect().map(_.toSeq).toSet
    val base = Tables(spark, sf0001, "orders")
      .collect().map(_.toSeq).toSet
    assert(atStart == base)
  }

  test("hex classes used by the slices are honest (sanity of the idiom)") {
    // the driver corpus must populate every behavior class: 3-version
    // keys, 2-version, 1-version, tombstoned, untouched
    val counts = Tables(spark, sf0001, "orders")
      .withColumn("hx", substring(md5($"o_orderkey".cast("string")), 1, 1))
      .groupBy("hx").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for (cls <- Seq(Seq("0", "1"), Seq("2", "3"), Seq("4", "5", "6", "7"),
      MergeOnRead.DeleteHex, Seq("8", "9", "a")))
      assert(cls.exists(h => counts.getOrElse(h, 0L) > 0), cls.toString)
    // spec-side md5 agrees with the engine idiom (guards the helper)
    assert(Seq(1L, 2L, 3L).forall(k => hex(k).matches("[0-9a-f]")))
  }

  test("IVM: maintained aggregate ≡ from-scratch aggregate over the " +
    "resolved snapshot") {
    val maintained = graft.operators.Ivm.ordersAggIvm(spark, sf0001)
      .collect().map(_.toSeq).toSet
    val scratch = MergeOnRead.snapshot(spark, sf0001)
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        sum($"o_totalprice".cast("decimal(18,2)")).cast("double")
          .as("total_price"))
      .collect().map(_.toSeq).toSet
    assert(maintained == scratch,
      s"diff: +${(maintained -- scratch).take(2)} " +
        s"-${(scratch -- maintained).take(2)}")
  }

  test("IVM: the delta actually moved the view (not a vacuous merge)") {
    val maintained = graft.operators.Ivm.ordersAggIvm(spark, sf0001)
      .collect().map(_.toSeq).toSet
    val mvOnly = Tables(spark, sf0001, "orders")
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        sum($"o_totalprice".cast("decimal(18,2)")).cast("double")
          .as("total_price"))
      .collect().map(_.toSeq).toSet
    // upserts rewrote statuses for half the keys and tombstoned e-f:
    // the maintained view must differ from the stale MV, and must
    // contain the log-introduced statuses
    assert(maintained != mvOnly)
    val statuses = maintained.map(_.head.asInstanceOf[String])
    assert(Set("U0", "U1", "U2").subsetOf(statuses), statuses.toString)
  }

  test("streaming IVM: every intermediate MV version equals the " +
    "from-scratch aggregate at that log sequence") {
    val root = graft.operators.Ivm.streamedMvRoot(spark, sf0001)
    def scratchAt(seq: Long) = MergeOnRead.snapshotAt(spark, sf0001, seq)
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum($"o_totalprice".cast("decimal(18,2)"))
          .cast("decimal(28,2)").as("s"))
      .collect().map(_.toSeq).toSet
    // batch → max-seq mapping derives from the files-per-trigger
    // knob: with mft=2 over the 3-file feed, batch 0 covers seqs 0-1
    // and batch 1 covers seq 2 — each version must still equal the
    // from-scratch aggregate at its batch's last applied seq
    val mft = graft.operators.Ivm.StreamMvFilesPerTrigger
    val lastSeq = 2
    val batches = (lastSeq + mft) / mft
    for (b <- 0 until batches) {
      val seq = math.min((b + 1) * mft - 1, lastSeq).toLong
      val mv = spark.read.parquet(s"$root/mv/v$b")
        .select($"o_orderstatus", $"n", $"s".cast("decimal(28,2)"))
        .collect().map(_.toSeq).toSet
      assert(mv == scratchAt(seq),
        s"batch $b MV diverged: +${(mv -- scratchAt(seq)).take(2)}")
    }
    // and the current-version state holds exactly the touched keys
    val cur = spark.read.parquet(s"$root/current/v${batches - 1}")
    val logKeys = spark.read.parquet(
      MergeOnRead.deltaLogDir(spark, sf0001))
      .select($"o_orderkey").distinct().count()
    assert(cur.select($"o_orderkey").distinct().count() == logKeys)
    assert(cur.groupBy($"o_orderkey").count().filter($"count" > 1)
      .count() == 0, "current state must hold ONE version per key")
  }

  test("cdc extract: the orders diff recovers exactly the applied " +
      "change classes; I arm fires on the SCD2 as-of pair") {
    import org.apache.spark.sql.functions._
    // MOR pair: every D key is hex e-f, every U key hex 0-7, no I
    val d = MergeOnRead.snapshotDiff(
      Tables(spark, sf0001, "orders").select($"o_orderkey".as("k"),
        $"o_orderstatus".as("s"), $"o_totalprice".as("v")),
      MergeOnRead.snapshot(spark, sf0001).select($"o_orderkey".as("k"),
        $"o_orderstatus".as("s"), $"o_totalprice".as("v")))
      .withColumn("hx", substring(md5($"k".cast("string")), 1, 1))
      .collect().map(r => (r.getAs[String]("op"), r.getAs[String]("hx")))
    assert(d.nonEmpty)
    assert(d.forall { case (op, hx) =>
      (op == "D" && "ef".contains(hx)) ||
        (op == "U" && "01234567".contains(hx)) })
    assert(d.count(_._1 == "D") > 0)
    assert(!d.exists(_._1 == "I"), "MOR feed never inserts")
    // SCD2 as-of pair: inserts (key % 25 pool, shifted +10M) MUST
    // surface as I; segment/balance drift as U; nothing as D
    def sliceAt(date: String) = graft.operators.Scd
      .scd2Dim(spark, sf0001)
      .filter($"valid_from" <= to_date(lit(date)) &&
        to_date(lit(date)) < $"valid_to")
      .select($"c_custkey".as("k"), $"c_mktsegment".as("s"),
        $"c_acctbal".as("v"))
    val sd = MergeOnRead.snapshotDiff(
        sliceAt("1995-06-01"), sliceAt("1999-01-01"))
      .select($"op", $"k").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val ops = sd.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(ops.contains("I") && ops("I").nonEmpty, "no inserts detected")
    assert(ops("I").forall(k => k >= 10000000L && (k - 10000000L) % 25 == 0))
    assert(ops.contains("U") && ops("U").forall(k => k % 10 < 4))
    assert(!ops.contains("D"), "SCD2 never deletes")
  }

  test("log checkpoint: ckpt+tail read ≡ full-log read row-for-row, " +
      "state is per-key, window input is O(changes)") {
    val full = MergeOnRead.snapshot(spark, sf0001)
      .orderBy("o_orderkey").collect().toSeq
    val via = MergeOnRead.snapshotViaCheckpoint(spark, sf0001)
      .orderBy("o_orderkey").collect().toSeq
    assert(via == full && full.nonEmpty)
    // per-key state: one row per key touched at _seq ≤ CheckpointSeq
    val ckpt = spark.read.parquet(
      MergeOnRead.checkpointDir(spark, sf0001))
    val log = spark.read.parquet(
      MergeOnRead.deltaLogDir(spark, sf0001))
    val touched = log
      .filter(col("_seq") <= MergeOnRead.CheckpointSeq)
      .select("o_orderkey").distinct().count()
    assert(ckpt.count() == touched)
    assert(ckpt.groupBy("o_orderkey").count()
      .filter(col("count") > 1).isEmpty)
    // the read's window ranks ckpt ∪ tail only — O(changes), not
    // O(full log): strictly fewer rows than replaying the whole log
    val tail = log.filter(col("_seq") > MergeOnRead.CheckpointSeq)
    assert(ckpt.count() + tail.count() < log.count())
  }

  test("log checkpoint alone IS the as-of-CheckpointSeq snapshot") {
    val asof = MergeOnRead
      .snapshotAt(spark, sf0001, MergeOnRead.CheckpointSeq)
      .orderBy("o_orderkey").collect().toSeq
    val viaCkpt = MergeOnRead.ordersMorCkptAsof(spark, sf0001)
    val direct = MergeOnRead.ordersMorAsof(spark, sf0001)
    assert(viaCkpt.collect().toSeq == direct.collect().toSeq)
    assert(asof.nonEmpty)
  }

  test("vacuum physically deletes exactly the checkpoint-superseded " +
    "log files; the post-vacuum read loses nothing") {
    import org.apache.spark.sql.functions._
    val fullDir = new java.io.File(MergeOnRead.deltaLogDir(spark, sf0001))
    val vacDir = new java.io.File(MergeOnRead.vacuumedLogDir(spark, sf0001))
    def names(d: java.io.File) = d.listFiles
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    // the full-history log is untouched (other readers keep time travel)
    val full = names(fullDir)
    val surviving = names(vacDir)
    assert(surviving.subsetOf(full) && surviving.size < full.size,
      "vacuum deleted nothing")
    // bytes gone: every deleted name is absent from the vacuumed dir,
    // and NO surviving row sits at/below the floor (prefix files were
    // single-seq appends, so file-level deletion is exact)
    val survivingRows = spark.read.parquet(vacDir.getAbsolutePath)
    assert(survivingRows.filter(
      col("_seq") <= MergeOnRead.CheckpointSeq).count() == 0,
      "a checkpoint-superseded version survived vacuum")
    // the tail files are byte-identical copies of their originals
    surviving.foreach { n =>
      assert(new java.io.File(vacDir, n).length ==
        new java.io.File(fullDir, n).length)
    }
    // read equivalence: ckpt + vacuumed tail ≡ full-log resolve
    val post = MergeOnRead.ordersMorVacuumed(spark, sf0001)
    val pre = MergeOnRead.ordersMergeOnRead(spark, sf0001)
    assert(post.collect().toSeq == pre.collect().toSeq)
  }
}
