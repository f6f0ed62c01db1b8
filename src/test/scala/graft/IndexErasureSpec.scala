package graft

import org.apache.spark.sql.functions._
import graft.operators.{GraphOps, IncrementalDedup, IndexErasure,
  IvfMaintained, TextOps}

/** Erasure propagation through the derived-index families: the delete
  * delta is a pure file-set ADDITION outside the index root, the
  * erased read path surfaces no erased id, and the retirement is
  * non-vacuous (the raw index really held rows of the erased class). */
class IndexErasureSpec extends SparkSpec {

  private def md5Nibble(v: Long): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    "%02x".format(md.digest(v.toString.getBytes("UTF-8"))(0)).substring(0, 1)
  }
  private def isErased(id: Long): Boolean = md5Nibble(id) == "a"

  private def listFiles(root: String): Map[String, Long] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles).getOrElse(Array.empty).toSeq.flatMap(walk)
      else Seq(f)
    walk(new java.io.File(root))
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
      .map(f => f.getAbsolutePath -> f.length).toMap
  }

  /** Shared contract: building + reading the delete delta for `root`
    * leaves every index file byte-identical (name+length+mtime proxy:
    * name+length set equality) and the erased view holds no retired
    * row, while the raw scan held some (non-vacuous). */
  private def checkFamily(root: String,
      retire: org.apache.spark.sql.Column): Unit = {
    val before = listFiles(root)
    val view = IndexErasure.erasedView(spark, root, retire)
    val survivors = view.count()
    val after = listFiles(root)
    assert(before == after,
      "delete-delta build touched index files under the root")
    val raw = spark.read.parquet(root)
    val rawN = raw.count()
    val retiredN = raw.filter(retire).count()
    assert(retiredN > 0, s"vacuous erasure: no retired rows in $root")
    assert(survivors == rawN - retiredN)
    assert(view.filter(retire).count() == 0,
      "erased view still surfaces a retired row")
  }

  test("postings index: delta is additive, erased view clean, " +
      "physical fold's raw scan holds zero erased doc ids") {
    val st = TextOps.maintainedPostings(spark, sf0001)
    checkFamily(st.root, IndexErasure.erased(col("doc_id")))
    // the erased class lives in day-1 files only: day-2 delta files
    // by construction carry no erased postings
    val delta = spark.read.parquet(
      st.deltaFiles.keys.toSeq.map(_.toString): _*)
    assert(delta.filter(IndexErasure.erased(col("doc_id"))).count() == 0)
    // physical fold: bytes gone from a RAW scan, partitioning kept
    val folded = TextOps.erasedFoldedPostingsDir(spark, sf0001)
    val rawFold = spark.read.parquet(folded)
    assert(rawFold.filter(IndexErasure.erased(col("doc_id"))).count() == 0)
    assert(new java.io.File(folded).listFiles
      .exists(f => f.isDirectory && f.getName.startsWith("tb=")),
      "fold lost the term-bucket partitioning")
  }

  test("IVF lists: delta additive, erased view clean, base/delta " +
      "file sets untouched") {
    val st = IvfMaintained.state(spark, sf0001)
    checkFamily(st.root, IndexErasure.erased(col("vec_id")))
    // the maintained state's own base+delta bookkeeping still matches
    // the on-disk set — the DV build added nothing under the root
    val now = listFiles(st.root).map { case (k, v) =>
      new java.io.File(k).getName -> v }
    assert(now == st.baseFiles ++ st.deltaFiles)
  }

  test("kNN edge files: retiring edges that touch an erased vector " +
      "leaves no erased endpoint reachable") {
    val root = GraphOps.knnEdgesDir(spark, sf0001)
    val retire = IndexErasure.erased(col("src")) ||
      IndexErasure.erased(col("dst"))
    checkFamily(root, retire)
    // the graded walk's output never contains an erased vec_id
    val hops = GraphOps.knnBfsHopsErased(spark, sf0001).collect()
    assert(hops.nonEmpty)
    assert(hops.forall(r => !isErased(r.getLong(0))),
      "BFS over the erased graph reached an erased vector")
  }

  test("packed shards: erased segments retired under a FROZEN layout " +
      "(survivors keep their pack ids; a repack would have moved docs)") {
    import graft.operators.Packing
    val root = Packing.segmentExportDir(spark, sf0001)
    checkFamily(root, IndexErasure.erased(col("doc_id")))
    // frozen-layout pin: repacking ONLY the survivors assigns at
    // least one document a different pack than the stored export —
    // proving the erased view is a retirement, not a repack
    val stored = spark.read.parquet(root)
      .filter(!IndexErasure.erased(col("doc_id")))
      .groupBy(col("doc_id")).agg(min(col("pack")).as("pack"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val repacked = Packing.survivorRepackFirstPacks(spark, sf0001)
    assert(repacked.exists { case (id, p) => stored(id) != p },
      "survivor-only repack matched the frozen layout everywhere — " +
        "the frozen-vs-repack distinction is vacuous on this corpus")
  }

  test("graph-ANN beam over the erased edge view: result holds no " +
      "erased id; recall row well-formed") {
    val topk = GraphOps.graphAnnTopkErased(spark, sf0001).collect()
    assert(topk.nonEmpty)
    assert(topk.forall(r => !isErased(r.getLong(0))),
      "post-erasure beam walk returned an erased vec_id")
    val rec = GraphOps.graphAnnRecallErased(spark, sf0001).collect()
    assert(rec.length == 1)
    val overlap = rec.head.getLong(1)
    assert(overlap >= 0 && overlap <= 10)
  }

  test("dedup signature index: erased view clean; a doc whose only " +
      "match was erased flips to 'new'") {
    val root = IncrementalDedup.indexPath(spark, sf0001)
    checkFamily(root, IndexErasure.erased(col("doc_id")))
    // semantics: verdicts can only move toward 'new' when base rows
    // vanish (exact→new, near→new, never the reverse)
    val before = IncrementalDedup.verdictsIndexed(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val after = IncrementalDedup.verdictsErased(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(before.keySet == after.keySet)
    val rank = Map("new" -> 0, "near" -> 1, "exact" -> 2)
    assert(after.forall { case (id, v) => rank(v) <= rank(before(id)) },
      "a verdict strengthened after base rows were erased")
  }

  test("join-view serving store: files frozen, erased view clean, and " +
      "the census equals the base census minus exactly the erased " +
      "customers' contribution") {
    val root = graft.operators.JoinIvm.maintainedDir(spark, sf0001)
    checkFamily(root, IndexErasure.erased(col("o_custkey")))
    // the erased census per segment ≡ recount over surviving rows of
    // the SAME store (no segment may drop out silently unless every
    // one of its rows was erased)
    val store = spark.read.parquet(root)
    val expect = store
      .filter(!IndexErasure.erased(col("o_custkey")))
      .groupBy(col("c_mktsegment")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = graft.operators.JoinIvm.ordersJoinIvmErased(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expect)
  }

  test("full lifecycle: grow + forget compose — the maintained graph's " +
      "delete delta retires rows in BOTH generations' files, and the " +
      "lifecycle walk holds no erased id") {
    val st = GraphOps.maintainedEdges(spark, sf0001)
    val retire = IndexErasure.erased(col("src")) ||
      IndexErasure.erased(col("dst"))
    checkFamily(st.root, retire)
    // the erase class is base-side, but insert edges link new→base:
    // retirement must be non-vacuous in EACH generation's file set
    def hits(files: Map[String, Long]): Long =
      spark.read.parquet(files.keys.toSeq.map(n => s"${st.root}/$n"): _*)
        .filter(retire).count()
    assert(hits(st.baseFiles) > 0, "no retired base-edge rows")
    assert(hits(st.deltaFiles) > 0, "no retired insert-edge rows")
    val hops = GraphOps.knnBfsHopsLifecycle(spark, sf0001).collect()
    assert(hops.nonEmpty)
    hops.foreach(r => assert(!isErased(r.getLong(0)),
      s"lifecycle walk labeled erased vec ${r.getLong(0)}"))
  }

  test("post-MERGE store: files frozen, erased view clean, and " +
      "NULL-custkey insert rows all survive (the NULL-key contract)") {
    val root = graft.operators.MergeInto.mergedDir(spark, sf0001)
    checkFamily(root, IndexErasure.erased(col("o_custkey")))
    val view = IndexErasure.erasedView(spark, root,
      IndexErasure.erased(col("o_custkey")))
    val store = spark.read.parquet(root)
    val nullRows = store.filter(col("o_custkey").isNull).count()
    assert(nullRows > 0, "no NULL-keyed insert rows — contract untested")
    assert(view.filter(col("o_custkey").isNull).count() == nullRows,
      "a NULL-keyed row was retired — erasure must name identified ids")
  }
}
