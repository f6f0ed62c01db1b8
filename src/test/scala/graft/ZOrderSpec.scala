package graft

import org.apache.spark.sql.functions._
import graft.operators.ZOrder

/** Z-order layout invariants on sf0.001: Morton-code expression ≡
  * driver reference, layout file count + content parity, manifest
  * skipping actually drops files for the graded box, and the
  * comparative claim — for a DATE-only predicate the z-layout's
  * candidate set is strictly smaller than a custkey-range-sorted
  * layout's (which cannot prune the second dimension at all). */
class ZOrderSpec extends SparkSpec {

  /** Files the query's SCAN NODE actually read (r6 verdict #4: the
    * prune must be visible in the plan, not just in a helper's return
    * value): execute, then sum the FileSourceScanExec `numFiles`
    * metric across the (AQE-expanded) executed plan. */
  private def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    fileScans(df.queryExecution.executedPlan)
      .map(_.metrics("numFiles").value).sum
  }

  test("graded box/date scans report the MANIFEST-pruned file count") {
    val keepBox = ZOrder.prunedFiles(spark, sf0001)
    assert(scannedFiles(ZOrder.ordersZorderBox(spark, sf0001))
      == keepBox.length)
    val keepDate = ZOrder.prunedFilesDate(spark, sf0001)
    assert(scannedFiles(ZOrder.ordersZorderDateRange(spark, sf0001))
      == keepDate.length)
  }

  test("maintained z-layout: day-1 data + manifest files untouched by " +
      "the append; delta manifest covers exactly the delta files; the " +
      "grown-manifest prune still bites and loses nothing") {
    import org.apache.spark.sql.functions._
    val st = ZOrder.maintainedZorder(spark, sf0001)
    assert(st.baseData.nonEmpty && st.deltaData.nonEmpty)
    // untouched base file sets (data AND manifest), by name + length
    val dataNow = st.baseData.keys.map(n =>
      n -> new java.io.File(st.dataDir, n).length).toMap
    assert(dataNow == st.baseData, "a day-1 data file was rewritten")
    val mfNow = st.baseManifest.keys.map(n =>
      n -> new java.io.File(st.manifestDir, n).length).toMap
    assert(mfNow == st.baseManifest, "a day-1 manifest file was rewritten")
    // manifest rows = one per data file, delta rows address delta files
    val mfRows = spark.read.parquet(st.manifestDir).select(col("file"))
      .collect().map(r =>
        new org.apache.hadoop.fs.Path(r.getString(0)).getName).toSet
    assert(mfRows == st.baseData.keySet ++ st.deltaData.keySet)
    // the grown layout is the whole table (nothing lost or doubled)
    assert(spark.read.parquet(st.dataDir).count() ==
      Tables(spark, sf0001, "orders").count())
    // pruning still bites on the grown manifest, and the graded box
    // equals the plain-predicate answer
    val q = ZOrder.ordersZorderMaintainedBox(spark, sf0001)
    val rows = q.collect().map(_.toSeq).toSeq
    val scanned = scannedFiles(q)
    assert(scanned < st.baseData.size + st.deltaData.size,
      s"no pruning: $scanned files scanned")
    val b = Tables(spark, sf0001, "orders")
    val bounds = b.agg(min(col("o_custkey")).cast("double"),
      max(col("o_custkey")).cast("double")).head()
    val hi = bounds.getDouble(0) +
      0.25 * (bounds.getDouble(1) - bounds.getDouble(0))
    val expect = b
      .filter(col("o_custkey") >= bounds.getDouble(0) &&
        col("o_custkey") <= hi &&
        to_date(col("o_orderdate")) >= lit(ZOrder.DateLo).cast("date") &&
        to_date(col("o_orderdate")) < lit(ZOrder.DateHi).cast("date"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("total_price"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"))
      .orderBy("o_orderstatus").collect().map(_.toSeq).toSeq
    assert(rows == expect)
  }

  test("composed zone+bloom prune: the intersected keep set is at most " +
      "each single prune, the scan reports it, and nothing is lost") {
    import org.apache.spark.sql.functions._
    val zone = ZOrder.comboZoneKeep(spark, sf0001)
    val bloom = ZOrder.comboBloomKeep(spark, sf0001)
    val combo = zone.intersect(bloom)
    val total = ZOrder.ZFiles
    assert(zone.nonEmpty && bloom.nonEmpty && combo.nonEmpty)
    assert(combo.size <= zone.size && combo.size <= bloom.size)
    // each single prune — and a fortiori the composition — skips
    assert(bloom.size < total,
      s"bloom claimed every file ($total) — no skipping to compose")
    val q = ZOrder.orderLookupZBloom(spark, sf0001)
    assert(scannedFiles(q) == combo.size)
    // losslessness against the plain predicate on the ORIGINAL table
    val expect = Tables(spark, sf0001, "orders")
      .filter(col("o_custkey") === ZOrder.ComboKey &&
        to_date(col("o_orderdate")) >= lit(ZOrder.ComboDateLo).cast("date") &&
        to_date(col("o_orderdate")) < lit(ZOrder.ComboDateHi).cast("date"))
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority")
      .orderBy("o_orderkey").collect().map(_.toSeq).toSeq
    assert(expect.nonEmpty, "vacuous combo predicate at sf0.001")
    assert(q.collect().map(_.toSeq).toSeq == expect)
    // the bloom keep is a SUPERSET of files truly holding the key
    // (never-false-negative), zone keep of files intersecting the range
    val truth = spark.read.parquet(ZOrder.zorderedOrders(spark, sf0001)._1)
      .filter(col("o_custkey") === ZOrder.ComboKey)
      .select(input_file_name().as("f")).distinct().collect()
      .map(r => new org.apache.hadoop.fs.Path(r.getString(0)).getName).toSet
    assert(truth.subsetOf(bloom), s"false negative: ${truth -- bloom}")
  }

  test("Morton interleave expression matches the driver reference") {
    val rnd = new scala.util.Random(42)
    val pairs = Seq.fill(256)((rnd.nextInt(65536), rnd.nextInt(65536))) ++
      Seq((0, 0), (65535, 0), (0, 65535), (65535, 65535), (1, 2))
    val df = spark.createDataFrame(pairs).toDF("a", "b")
      .withColumn("z", ZOrder.interleaveBits(
        col("a").cast("long"), col("b").cast("long")))
    df.collect().foreach { r =>
      assert(r.getLong(2) == ZOrder.interleaveRef(r.getInt(0), r.getInt(1)),
        s"(${r.getInt(0)}, ${r.getInt(1)})")
    }
  }

  test("z-layout: expected file count, pure layout change") {
    val (data, _) = ZOrder.zorderedOrders(spark, sf0001)
    val p = new org.apache.hadoop.fs.Path(data)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val n = fs.listStatus(p)
      .count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    // range sampling may leave a boundary partition empty (no file);
    // the layout claim is "many small rectangles", not an exact count
    assert(n >= ZOrder.ZFiles / 2 && n <= ZOrder.ZFiles, s"$n files")
    val orig = Tables(spark, sf0001, "orders").agg(
      count(lit(1)), sum(col("o_orderkey")), sum(col("o_custkey"))).head()
    val copy = spark.read.parquet(data).agg(
      count(lit(1)), sum(col("o_orderkey")), sum(col("o_custkey"))).head()
    assert(orig == copy)
  }

  test("graded box scan opens strictly fewer files than exist; pruning is lossless") {
    val keep = ZOrder.prunedFiles(spark, sf0001)
    assert(keep.nonEmpty && keep.length < ZOrder.ZFiles,
      s"${keep.length} of ${ZOrder.ZFiles} files — nothing skipped")
    // lossless: pruned result ≡ the same filter+agg over the FULL copy
    val (data, _) = ZOrder.zorderedOrders(spark, sf0001)
    val b = ZOrder.bounds(spark, sf0001)
    val full = spark.read.parquet(data)
      .filter(col("o_custkey") >= b.ckLo &&
        col("o_custkey") <= ZOrder.custkeyHi(spark, sf0001) &&
        to_date(col("o_orderdate")) >= lit(ZOrder.DateLo).cast("date") &&
        to_date(col("o_orderdate")) < lit(ZOrder.DateHi).cast("date"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        min("o_orderkey").as("lo"), max("o_orderkey").as("hi"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val pruned = ZOrder.ordersZorderBox(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4)))
      .toSet
    assert(full == pruned)
  }

  test("date-only predicate: z-layout candidates < single-key-sorted layout candidates") {
    // comparison layout: same file count, range-sorted on custkey only
    val out = Tables.scratchDir("graft_cksort_orders_").getAbsolutePath
    Tables(spark, sf0001, "orders")
      .repartitionByRange(ZOrder.ZFiles, col("o_custkey"))
      .write.mode("overwrite").parquet(out)
    val dateOverlap = (mf: org.apache.spark.sql.DataFrame) => mf.filter(
      col("min_dt") < lit(ZOrder.DateHi).cast("date") &&
      col("max_dt") >= lit(ZOrder.DateLo).cast("date")).count()
    val ckManifest = ZOrder.buildManifest(spark, out)
    val ckFiles = ckManifest.count()
    val ckCand = dateOverlap(ckManifest)
    val (_, mfDir) = ZOrder.zorderedOrders(spark, sf0001)
    val zCand = dateOverlap(spark.read.parquet(mfDir))
    // custkey sort leaves the date dimension unclustered: every file
    // spans the 1-year window; the Morton layout confines it
    assert(ckCand == ckFiles, s"custkey layout pruned? $ckCand of $ckFiles")
    assert(zCand < ckCand, s"z=$zCand vs ck=$ckCand")
  }

  test("date-only graded twin prunes via the manifest and is lossless") {
    val keep = ZOrder.prunedFilesDate(spark, sf0001)
    val (data, mfDir) = ZOrder.zorderedOrders(spark, sf0001)
    val total = spark.read.parquet(mfDir).count()
    assert(keep.nonEmpty && keep.length < total,
      s"${keep.length} of $total files — nothing skipped on the date dim")
    val full = spark.read.parquet(data)
      .filter(to_date(col("o_orderdate")) >= lit(ZOrder.DateLo).cast("date") &&
        to_date(col("o_orderdate")) < lit(ZOrder.DateHi).cast("date"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        min("o_orderkey").as("lo"), max("o_orderkey").as("hi"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val pruned = ZOrder.ordersZorderDateRange(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(full == pruned)
  }
}
