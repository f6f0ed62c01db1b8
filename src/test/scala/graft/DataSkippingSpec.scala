package graft

import org.apache.spark.sql.functions._

/** Parquet ROW-GROUP skipping (zone maps) — the other storage-layout
  * lever next to bucketing: when data is WRITTEN SORTED on a filter
  * column, parquet's per-row-group min/max statistics let a pushed
  * range predicate skip whole row groups at scan time — at 100 TB the
  * difference between reading 1 % and 100 % of the table for a
  * selective query. Asserted via the scan's own numOutputRows metric:
  * with row-group skipping, rows that never leave the reader never
  * count.
  */
class DataSkippingSpec extends SparkSpec {

  test("sorted parquet + pushed range filter skips row groups (zone maps)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_skip_").toFile
    try {
      // small row groups so the sf0.001 table spans many of them
      Tables(spark, sf0001, "orders")
        .orderBy("o_totalprice")
        .coalesce(1)
        .write.option("parquet.block.size", 64 * 1024)
        .mode("overwrite").parquet(s"$tmp/by_price")
      val sorted = spark.read.parquet(s"$tmp/by_price")
      val total = sorted.count()

      def scanOutputRows(df: org.apache.spark.sql.DataFrame): Long = {
        df.collect()
        val scans = df.queryExecution.executedPlan.collectLeaves()
        scans.flatMap(_.metrics.get("numOutputRows")).map(_.value).sum
      }
      // selective range on the sort column: pushed to parquet, which
      // drops every row group whose [min,max] misses the range
      val selective = sorted.filter(col("o_totalprice") > 490000.0)
      val plan = selective.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters") &&
        plan.contains("GreaterThan(o_totalprice"), plan)
      val rowsRead = scanOutputRows(selective)
      val matched = selective.count()
      assert(matched > 0, "test range matches nothing — pick a new cutoff")
      assert(rowsRead < total / 2,
        s"scan emitted $rowsRead of $total rows — row groups not skipped " +
          "(is the file sorted and multi-row-group?)")
      // control: the SAME filter over an UNSORTED copy of the data
      // cannot skip (every row group spans the full price range)
      Tables(spark, sf0001, "orders")
        .repartition(1) // hash round-robin: price order destroyed
        .write.option("parquet.block.size", 64 * 1024)
        .mode("overwrite").parquet(s"$tmp/unsorted")
      val unsorted = spark.read.parquet(s"$tmp/unsorted")
        .filter(col("o_totalprice") > 490000.0)
      val rowsReadUnsorted = scanOutputRows(unsorted)
      assert(rowsReadUnsorted >= rowsRead,
        s"unsorted layout read fewer rows ($rowsReadUnsorted < $rowsRead)?")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory)
          Option(f.listFiles).getOrElse(Array.empty).foreach(rm)
        f.delete(); ()
      }
      rm(tmp)
    }
  }

  test("DPP: the dim-filtered star join prunes fact partitions at " +
    "runtime") {
    val df = Tables.ordersDppJoin(spark, sf0001)
    // the fact scan's partition filter is a DYNAMIC pruning subquery —
    // injected by Spark's DPP rule from the dim filter, not present in
    // the query text
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamic pruning expression in plan:\n$plan")
    // and the result is the rush tiers only (2 of 5 partitions)
    val rows = df.collect()
    assert(rows.map(_.getString(0)).toSet == Set("1-URGENT", "2-HIGH"))
    // control: statically inlining the tier predicate's key set reads
    // the same rows — DPP must be a pure access-path optimization
    val static = Tables.ordersPartitioned(spark, sf0001)
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("total_price"))
      .collect().map(_.toSeq).toSet
    assert(rows.map(_.toSeq).toSet == static)
  }

  test("partition-spec evolution: each generation prunes on ITS OWN " +
      "spec; the union equals the straight computation") {
    import graft.operators.Formats
    val df = Formats.ordersSpecEvolvedAgg(spark, sf0001)
    val got = df.collect().toSeq
    val scans = fileScans(df.queryExecution.executedPlan)
    assert(scans.size == 2, s"expected 2 generation scans, got $scans")
    val (d1, d2) = Formats.specEvolutionDirs(spark, sf0001)
    def scanFor(dir: String) = scans.find(
      _.relation.location.rootPaths.exists(
        _.toString.contains(new java.io.File(dir).getName)))
      .getOrElse(fail(s"no scan over $dir"))
    val s1 = scanFor(d1)
    val s2 = scanFor(d2)
    // generation 1 prunes on priority (its spec); generation 2 on month
    assert(s1.partitionFilters.mkString.contains("o_orderpriority"),
      s"gen-1 partition filters: ${s1.partitionFilters}")
    assert(s2.partitionFilters.mkString.contains("o_month"),
      s"gen-2 partition filters: ${s2.partitionFilters}")
    def filesUnder(dir: String): Long = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory)
          Option(f.listFiles).getOrElse(Array.empty).toSeq.flatMap(walk)
        else Seq(f)
      walk(new java.io.File(dir))
        .count(f => f.getName.endsWith(".parquet")).toLong
    }
    assert(s1.metrics("numFiles").value < filesUnder(d1),
      "gen-1 read every file — priority pruning did not bite")
    assert(s2.metrics("numFiles").value < filesUnder(d2),
      "gen-2 read every file — month pruning did not bite")
    // semantics: union ≡ straight computation over the original table
    val direct = Tables(spark, sf0001, "orders")
      .filter(col("o_orderpriority") === "1-URGENT" &&
        date_format(col("o_orderdate"), "yyyy-MM")
          .between("1996-01", "1996-06"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("total_price"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"))
      .orderBy("o_orderstatus").collect().toSeq
    assert(got == direct && got.nonEmpty)
  }
}
