package graft

import org.apache.spark.sql.functions._
import graft.operators.Pii

/** PII scan + redaction on sf0.001: the scanners find exactly the
  * injected identifiers, redaction removes every match and is
  * idempotent, and the checksummed output is deterministic. */
class PiiSpec extends SparkSpec {
  import spark.implicits._

  private def aug = Tables(spark, sf0001, "documents")
    .withColumn("aug", Pii.augmented)
    .withColumn("hx", substring(md5($"doc_id".cast("string")), 1, 1))

  test("scanners find exactly the injected identifiers, per hex class") {
    val d = aug
      .withColumn("n_e",
        size(expr(s"regexp_extract_all(aug, '${Pii.EmailRe}', 0)")))
      .withColumn("n_p",
        size(expr(s"regexp_extract_all(aug, '${Pii.PhoneRe}', 0)")))
      .withColumn("n_i",
        size(expr(s"regexp_extract_all(aug, '${Pii.IpRe}', 0)")))
    // each class carries exactly one identifier of its kind, rest zero
    assert(d.filter($"hx".isin("0", "1", "2", "3"))
      .filter($"n_e" =!= 1 || $"n_p" =!= 0 || $"n_i" =!= 0).count() == 0)
    assert(d.filter($"hx".isin("4", "5"))
      .filter($"n_e" =!= 0 || $"n_p" =!= 1 || $"n_i" =!= 0).count() == 0)
    assert(d.filter($"hx" === "6")
      .filter($"n_e" =!= 0 || $"n_p" =!= 0 || $"n_i" =!= 1).count() == 0)
    assert(d.filter(!$"hx".isin("0", "1", "2", "3", "4", "5", "6"))
      .filter($"n_e" + $"n_p" + $"n_i" =!= 0).count() == 0)
    // every class is populated in the corpus (the test is not vacuous)
    assert(d.filter($"n_e" === 1).count() > 0)
    assert(d.filter($"n_p" === 1).count() > 0)
    assert(d.filter($"n_i" === 1).count() > 0)
  }

  test("redaction removes every match and is idempotent") {
    val r = aug.withColumn("red", Pii.redact($"aug"))
      .withColumn("red2", Pii.redact(Pii.redact($"aug")))
    for (re <- Seq(Pii.EmailRe, Pii.PhoneRe, Pii.IpRe))
      assert(r.filter(
        size(expr(s"regexp_extract_all(red, '$re', 0)")) > 0).count() == 0,
        s"unredacted matches remain for $re")
    assert(r.filter($"red" =!= $"red2").count() == 0, "redact not idempotent")
    // masks actually landed (redaction changed the affected docs)
    assert(r.filter($"hx".isin("0", "1", "2", "3", "4", "5", "6"))
      .filter(!$"red".contains("[EMAIL]") && !$"red".contains("[PHONE]")
        && !$"red".contains("[IP]")).count() == 0)
  }

  test("audit query: counts reconcile with the hex classes") {
    val rows = Pii.piiRedaction(spark, sf0001).collect()
    val byClass = aug.groupBy($"hx").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    def classTotal(hs: Seq[String]) =
      hs.map(h => byClass.getOrElse(h, 0L)).sum
    assert(rows.map(_.getAs[Long]("n_emails")).sum ==
      classTotal(Seq("0", "1", "2", "3")))
    assert(rows.map(_.getAs[Long]("n_phones")).sum == classTotal(Seq("4", "5")))
    assert(rows.map(_.getAs[Long]("n_ips")).sum == classTotal(Seq("6")))
    assert(rows.map(_.getAs[Long]("n_docs_pii")).sum ==
      classTotal(Seq("0", "1", "2", "3", "4", "5", "6")))
    // checksums are stable across a recompute (determinism)
    val again = Pii.piiRedaction(spark, sf0001).collect()
    assert(rows.map(_.getAs[Long]("redacted_checksum")).toSeq ==
      again.map(_.getAs[Long]("redacted_checksum")).toSeq)
  }
}
