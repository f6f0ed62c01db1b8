package graft
import org.apache.spark.sql.SparkSession
object ProfEdit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name%-28s ${(System.nanoTime()-t0)/1e9}%6.2f s"); r
    }
    // warm the JVM on the tiny SF first
    graft.operators.EditJoin.fuzzyJoinQgram(spark, "/root/testdata/sf0.001").count()
    t("full cold")(graft.operators.EditJoin.fuzzyJoinQgram(spark, dir).count())
    t("full warm(substrate hot)")(graft.operators.EditJoin.fuzzyJoinQgram(spark, dir).count())
    val ents = graft.operators.EditJoin.entities(spark, dir)
    t("entities only")(ents.count())
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val g = ents.select(col("ent_id"), length(col("name")).as("len"),
      posexplode(expr("transform(sequence(1, length(name) - 2), i -> substring(name, i, 3))")).as(Seq("p","g")))
    val occW = Window.partitionBy(col("ent_id"), col("g")).orderBy(col("p"))
    val bag = g.withColumn("occ", row_number().over(occW))
      .select(col("ent_id"), col("len"), col("g"), col("occ"))
    println("[prof] bag rows " + t("bag")(bag.count()))
    val dfreq = bag.groupBy(col("g"), col("occ")).agg(count(lit(1)).as("df"))
    println("[prof] dfreq rows " + t("dfreq")(dfreq.count()))
    val w = Window.partitionBy(col("ent_id")).orderBy(col("df"), col("g"), col("occ"))
    val pref = bag.join(dfreq, Seq("g","occ")).withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 4).select(col("ent_id"), col("g"), col("occ"), col("len"))
    println("[prof] pref rows " + t("pref")(pref.count()))
    val cand = pref.as("a").join(pref.as("b"),
        col("a.g") === col("b.g") && col("a.occ") === col("b.occ") &&
        col("a.ent_id") < col("b.ent_id") && abs(col("a.len")-col("b.len")) <= 1)
      .select(col("a.ent_id").as("ent_a"), col("b.ent_id").as("ent_b")).distinct()
    println("[prof] cand rows " + t("cand")(cand.count()))
    val ver = cand.join(ents.select(col("ent_id").as("ent_a"), col("name").as("na")), Seq("ent_a"))
      .join(ents.select(col("ent_id").as("ent_b"), col("name").as("nb")), Seq("ent_b"))
      .withColumn("dist", levenshtein(col("na"), col("nb")).cast("bigint"))
      .filter(col("dist") <= 1)
    println("[prof] verify rows " + t("verify")(ver.count()))
    spark.stop()
  }
}
