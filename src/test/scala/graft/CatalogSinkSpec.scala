package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.streaming.{PhaseMachine, SseSink}
import graft.streaming.PhaseMachine.ToolEvent

/** Hive-style catalog surface (SURVEY.md §7.1 pt 7) + SSE sink (S3) +
  * partitioned-layout pruning (the S1 scale note: partition pruning is
  * what replaces the reference's proposed indexes at 100 TB). */
class CatalogSinkSpec extends SparkSpec {
  import spark.implicits._

  test("catalog: saveAsTable + spark.table round-trip") {
    val df = Tables(spark, sf0001, "nation")
    df.write.mode("overwrite").saveAsTable("graft_nation")
    try {
      assert(spark.table("graft_nation").count() == df.count())
      assert(spark.catalog.tableExists("graft_nation"))
      // SQL over the catalog table — the "Spark SQL reading Hive tables" path
      val n = spark.sql(
        "SELECT count(*) AS n FROM graft_nation WHERE n_regionkey = 0")
        .first().getLong(0)
      assert(n > 0)
    } finally spark.sql("DROP TABLE IF EXISTS graft_nation")
  }

  test("partitioned write → partition pruning in the scan") {
    val tmp = Files.createTempDirectory("graft_part").toString
    Tables(spark, sf0001, "documents")
      .write.mode("overwrite").partitionBy("lang").parquet(tmp)
    val scan = spark.read.parquet(tmp).filter($"lang" === "en")
    val physical = scan.queryExecution.executedPlan.toString
    assert(physical.contains("PartitionFilters"))
    assert(physical.contains("lang"))
    // pruned read touches only the en partition
    val all = spark.read.parquet(tmp).count()
    val en = scan.count()
    assert(en > 0 && en < all)
  }

  test("S3: SSE sink frames every event and terminates with done") {
    val out = Files.createTempDirectory("sse_out").toString
    val cp = Files.createTempDirectory("sse_cp").toString
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    val ms = MemoryStream[ToolEvent]
    val q = SseSink.start(PhaseMachine.run(spark, ms.toDS), out, cp)
    ms.addData(
      ToolEvent("c1", 1, "on_tool_start", "query_crm", "", false),
      ToolEvent("c1", 2, "on_tool_end", "query_crm", "{\"count\": 3}", true),
      ToolEvent("c1", 3, "error", "", "boom", false),
      ToolEvent("c1", 4, "end", "", "", false))
    q.processAllAvailable()
    q.stop()
    val lines = spark.read.textFile(out).collect().filter(_.nonEmpty)
    assert(lines.nonEmpty)
    assert(lines.forall(_.startsWith("data: {")))
    // every frame is valid JSON after the SSE prefix
    val parsed = spark.read.json(lines.map(_.stripPrefix("data: ")).toSeq.toDS)
    assert(parsed.filter(col("type") === "done").count() == 1)
    assert(parsed.filter(col("type") === "error").count() == 1)
    // ST6: done is the LAST event by seq
    val maxSeq = parsed.agg(max("seq")).first().getLong(0)
    assert(parsed.filter(col("seq") === maxSeq).first()
      .getAs[String]("type") == "done")
  }

  test("S1: JSON and CSV round-trip the documents table losslessly") {
    // the reference's native format is JSON (fans.json) — the library
    // must read/write the interchange formats, not just parquet
    val base = java.nio.file.Files.createTempDirectory("graft_fmt").toString
    val docs = Tables(spark, sf0001, "documents")
      .select("doc_id", "lang", "source", "n_chars", "text")
    docs.write.mode("overwrite").json(s"$base/docs_json")
    docs.write.mode("overwrite").option("header", "true")
      .csv(s"$base/docs_csv")
    val viaJson = spark.read.json(s"$base/docs_json")
      .select(docs.columns.map(c => col(c).cast(docs.schema(c).dataType)): _*)
    assert(viaJson.exceptAll(docs).count() == 0)
    assert(docs.exceptAll(viaJson).count() == 0)
    // CSV: same row count + key columns survive (text may contain
    // delimiters/newlines — quoting must handle them)
    val viaCsv = spark.read.option("header", "true")
      .option("multiLine", "true").csv(s"$base/docs_csv")
    assert(viaCsv.count() == docs.count())
    assert(viaCsv.select(col("doc_id").cast("long")).exceptAll(
      docs.select("doc_id")).count() == 0)
  }

  test("S1: ORC round-trips the events table with exact types") {
    // the third columnar format a warehouse migration meets (parquet is
    // the native one; ORC ships in Spark with zero extra deps) — types
    // survive exactly, unlike the text formats above
    val base = java.nio.file.Files.createTempDirectory("graft_orc").toString
    val ev = Tables(spark, sf0001, "events")
    ev.write.mode("overwrite").orc(s"$base/events_orc")
    val viaOrc = spark.read.orc(s"$base/events_orc")
    assert(viaOrc.schema == ev.schema, s"${viaOrc.schema} vs ${ev.schema}")
    assert(viaOrc.exceptAll(ev).count() == 0)
    assert(ev.exceptAll(viaOrc).count() == 0)
    // predicate pushdown works against the ORC scan too
    val plan = viaOrc.filter(col("event_type") === "view")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("EqualTo(event_type,view)"), plan)
  }
}
