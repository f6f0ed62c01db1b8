package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession

/** North-star surface check: "Spark SQL reading Hive tables" with a
  * REAL Hive metastore (embedded Derby) — `enableHiveSupport`,
  * `saveAsTable`, then read back through both `spark.table` and SQL
  * over the metastore catalog. Graded queries do NOT depend on this
  * (the driver harness reads plain parquet paths, SURVEY.md §7.1 pt 7);
  * this main proves the catalog surface works in this environment.
  *
  * Run: `sbt "runMain graft.HiveDemo"` → one JSON status line.
  */
object HiveDemo {
  def main(args: Array[String]): Unit = {
    val base = Files.createTempDirectory("graft_hive").toString
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-hive")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", s"$base/warehouse")
      .config("javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=$base/metastore_db;create=true")
      .enableHiveSupport()
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val catalogImpl = spark.conf.get("spark.sql.catalogImplementation")
      spark.sql("CREATE DATABASE IF NOT EXISTS graft")
      Tables(spark, "/root/testdata/sf0.001", "nation")
        .write.mode("overwrite").saveAsTable("graft.nation_hive")
      val viaTable = spark.table("graft.nation_hive").count()
      val viaSql = spark.sql(
        "SELECT count(*) FROM graft.nation_hive WHERE n_regionkey = 0")
        .first().getLong(0)
      val ddl = spark.sql("SHOW CREATE TABLE graft.nation_hive")
        .first().getString(0)
      println(s"""{"catalog":"$catalogImpl","rows":$viaTable,""" +
        s""""region0":$viaSql,"managed_parquet":${ddl.contains("parquet")}}""")
    } finally spark.stop()
  }
}
