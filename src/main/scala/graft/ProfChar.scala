package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
/** Scratch profiler (not graded, not shipped). */
object ProfChar {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[prof] $name%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s  (n=$n)")
    }
    val docs = Tables(spark, dir, "documents")
    docs.count()
    graft.sources.ResultCache.clear()
    operators.Similarity.neardupPairs(spark, "/root/testdata/sf0.001").count() // JIT
    graft.sources.ResultCache.clear()
    val fan = docs.repartition(32, col("doc_id"))
    def sh(base: DataFrame) = base.withColumn("t",
        graft.functions.Shingles.sparkToks)
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), explode(expr(graft.functions.Shingles.sparkExpr)).as("s"))
    t("shingle explode count") { sh(fan).count() }
    val slices = (0 to 3).map(i => substring(md5(col("s")), 1 + 8*i, 8).as(s"h$i"))
    val sigCols = (0 to 3).map(i => min(col(s"h$i")).as(s"m$i"))
    val sigs = sh(fan).select(Seq(col("doc_id")) ++ slices: _*)
      .groupBy(col("doc_id")).agg(sigCols.head, sigCols.tail: _*)
    val bands = sigs.select(col("doc_id"), explode(array((0 to 3).map(i =>
        struct(lit(i).as("band"), col(s"m$i").as("m"))): _*)).as("bm"))
      .select(col("doc_id"), col("bm.band").as("band"), col("bm.m").as("m"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    t("ACTION bands pin") { bands.count() }
    val cand = bands.select(col("doc_id").as("doc_a"), col("band"), col("m"))
      .join(bands.select(col("doc_id").as("doc_b"), col("band"), col("m")), Seq("band", "m"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    t("ACTION cand pin") { cand.count() }
    val candDocs = cand.select(col("doc_a").as("doc_id"))
      .union(cand.select(col("doc_b").as("doc_id"))).distinct()
    val shc = sh(docs.join(broadcast(candDocs), Seq("doc_id")))
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)
    t("ACTION shc pin") { shc.count() }
    val sizes = shc.groupBy(col("doc_id")).agg(count(lit(1)).as("nsh"))
    val inter = cand.join(shc.as("x"), col("doc_a") === col("x.doc_id"))
      .join(shc.as("y"), col("doc_b") === col("y.doc_id") && col("x.s") === col("y.s"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("n_inter"))
    t("ACTION verify") {
      inter.join(sizes.select(col("doc_id").as("doc_a"), col("nsh").as("na")), "doc_a")
        .join(sizes.select(col("doc_id").as("doc_b"), col("nsh").as("nb")), "doc_b")
        .count()
    }
    spark.stop()
  }
}
