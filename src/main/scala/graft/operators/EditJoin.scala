package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** APPROXIMATE STRING JOIN via Q-GRAM PREFIX FILTERING — every entity
  * pair within edit distance k, NO false negatives (Gravano/Ipeirotis/
  * Jagadish/Koudas/Muthukrishnan/Srivastava, "Approximate String Joins
  * in a Database (Almost) for Free", VLDB 2001): the scalable form of
  * the fuzzy entity match in [[Joins]] (`fuzzy_name_match` compares a
  * bounded dirty batch against a dimension; THIS is the symmetric
  * self-join over the whole entity corpus, where a quadratic
  * `levenshtein` is the thing a 100 TB engine must never run).
  *
  * The filter chain, each step provably lossless for k = 1, q = 3:
  *  - BAG of positional 3-grams per name, element = (gram, occurrence
  *    index): an edit destroys at most q grams, so dist(a,b) ≤ k ⇒
  *    bag-overlap ≥ max(|a|,|b|) − (q−1) − k·q;
  *  - PREFIX: under one global element order (ascending element df,
  *    gram/occ tiebreak — rarest first), two bags meeting that overlap
  *    must collide within their first k·q + 1 = 4 elements — the
  *    [[SetJoin]] prefix argument instantiated for the edit-distance
  *    overlap bound; only prefix elements enter the posting join;
  *  - LENGTH filter ||a|−|b|| ≤ k rides the join condition;
  *  - SHORT-NAME escape hatch: when max(|a|,|b|) < q·(k+1) the
  *    overlap bound is VACUOUS (≤ 0 shared grams required), so names
  *    of length ≤ q·(k+1) − 1 = 5 join ALL-PAIRS among themselves —
  *    the class is alphabet-bounded and tiny, and any (short, longer)
  *    pair still clears the bound on the longer side;
  *  - VERIFY: exact `levenshtein` (codegen'd built-in) on the
  *    candidates only.
  *
  * Why q = 3 and not 2 (r10): q-gram selectivity is governed by the
  * GRAM VOCABULARY, ~27^q over this alphabet. At q = 2 the whole
  * corpus shares 429 distinct (gram, occ) elements, so even
  * rarest-first prefixes collide massively — profiled 1.19M candidate
  * pairs for 7.5k names at sf0.1, with the verify join eating 4.7 s
  * of a 5.9 s query. q = 3 multiplies the vocabulary ×27 and
  * collapses the candidate set by ~25× for one extra prefix element
  * per name; at a 100 TB entity corpus the same dial (q ↑ with
  * corpus size) is what keeps the posting join linear.
  *
  * The corpus is a deterministic ENTITY table derived from documents
  * (first three words, lowercased) plus a planted dirty twin for half
  * the ids (one md5-positioned character deletion, id shifted by 10⁷ —
  * the [[Scd]] insert-shift idiom), so the join provably has work to
  * do: every planted twin sits at exactly distance 1 from its origin.
  * The DuckDB oracle runs the NAIVE quadratic `levenshtein` join over
  * the same construction — hash equality proves the three-stage filter
  * exact, and [[graft.EditJoinSpec]] re-proves it against a Spark
  * brute force plus the planted-pair containment.
  *
  * 100 TB shape: shuffles are element-granularity (df count, posting
  * join on rare grams — frequent grams are structurally excluded from
  * prefixes, the anti-skew property) and pair-granularity (verify);
  * the per-name windows are name-partitioned. Raise k/q and the
  * prefix just widens to k·q + 1.
  */
object EditJoin {

  private val K = 1
  private val Q = 3
  private val PrefixLen = K * Q + 1 // 4
  /** Below q·(k+1) chars the overlap bound is vacuous — all-pairs. */
  private val ShortLen = Q * (K + 1) - 1 // 5

  private def hexVal(c: Column): Column =
    instr(lit("0123456789abcdef"), c) - 1

  /** The entity table: clean first-3-word names ∪ planted 1-edit
    * twins (ids shifted +10⁷) for the md5-hex < '8' half — SERVED from
    * the shared substrate store ([[graft.sources.GramStore.serve]]):
    * one query uses the frame three times (gram bag + both verify-side
    * name joins) and the spec re-derives it, so r8-era code re-read
    * and re-tokenized `documents` per consumer. */
  private[graft] def entities(spark: SparkSession, dir: String): DataFrame =
    graft.sources.GramStore.serve(spark, "editents", dir)(
      entitiesUncached(spark, dir))

  private def entitiesUncached(spark: SparkSession, dir: String): DataFrame = {
    val toks = filter(split(col("text"), " "), t => t =!= "")
    val base = Tables(spark, dir, "documents")
      .select(col("doc_id"), toks.as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"),
        lower(concat_ws(" ", element_at(col("t"), 1),
          element_at(col("t"), 2), element_at(col("t"), 3))).as("name"))
    val md5c = md5(col("doc_id").cast("string"))
    val pos = (hexVal(substring(md5c, 2, 1)) % length(col("name"))) + 1
    val dirty = base.filter(substring(md5c, 1, 1) < "8")
      .select((col("doc_id") + 10000000L).as("ent_id"),
        concat(col("name").substr(lit(1), pos - 1),
          col("name").substr(pos + 1, length(col("name")))).as("name"))
    base.select(col("doc_id").as("ent_id"), col("name"))
      .unionByName(dirty)
  }

  /** Positional-Q-gram BAG elements with per-name occurrence index. */
  private def gramBag(ents: DataFrame): DataFrame = {
    val g = ents.select(col("ent_id"), length(col("name")).as("len"),
      posexplode(expr(
        s"transform(sequence(1, length(name) - ${Q - 1}), " +
          s"i -> substring(name, i, $Q))"))
        .as(Seq("p", "g")))
    val occW = Window.partitionBy(col("ent_id"), col("g")).orderBy(col("p"))
    g.withColumn("occ", row_number().over(occW))
      .select(col("ent_id"), col("len"), col("g"), col("occ"))
  }

  /** GRADED: all entity pairs within edit distance 1, exact. */
  def fuzzyJoinQgram(spark: SparkSession, dir: String): DataFrame = {
    val ents = entities(spark, dir)
    val bag = gramBag(ents)
    val dfreq = bag.groupBy(col("g"), col("occ"))
      .agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("ent_id"))
      .orderBy(col("df"), col("g"), col("occ"))
    // r12 NOTE (§1.1 "a fresh implementation of the ideal plan is
    // usually slower"): carrying names INTO the posting join (to drop
    // the two post-distinct name joins) was tried and REGRESSED 3.8 s →
    // 12 s — with names present on both join inputs the optimizer
    // pushes the levenshtein verify through the distinct INTO the
    // posting join condition, so it runs per RAW collision (once per
    // shared prefix element) instead of per deduplicated pair, and the
    // now-wider join side falls out of broadcast into a sort-merge
    // join. This shape — dedup pairs first, attach names by two
    // broadcast joins, verify once per candidate — is the measured
    // optimum; the sibling passjoin/symspell chains carry names inline
    // instead because their raw collision sets are near-minimal.
    val pref = bag.join(dfreq, Seq("g", "occ"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= PrefixLen)
      .select(col("ent_id"), col("g"), col("occ"), col("len"))
    // the vacuous-bound class: pairs where BOTH names are ≤ ShortLen
    // chars can be within distance K while sharing zero grams — they
    // join all-pairs (alphabet-bounded class; a (short, longer) pair
    // still clears the bound on the longer side and the short side's
    // whole bag fits inside its prefix)
    val shorts = ents.filter(length(col("name")) <= ShortLen)
    val shortPairs = shorts.as("a").join(shorts.as("b"),
        col("a.ent_id") < col("b.ent_id") &&
          abs(length(col("a.name")) - length(col("b.name"))) <= K)
      .select(col("a.ent_id").as("ent_a"), col("b.ent_id").as("ent_b"))
    val cand = pref.as("a").join(pref.as("b"),
        col("a.g") === col("b.g") && col("a.occ") === col("b.occ") &&
          col("a.ent_id") < col("b.ent_id") &&
          abs(col("a.len") - col("b.len")) <= K)
      .select(col("a.ent_id").as("ent_a"), col("b.ent_id").as("ent_b"))
      .unionByName(shortPairs)
      .distinct()
    cand
      .join(ents.select(col("ent_id").as("ent_a"), col("name").as("na")),
        Seq("ent_a"))
      .join(ents.select(col("ent_id").as("ent_b"), col("name").as("nb")),
        Seq("ent_b"))
      .withColumn("dist", levenshtein(col("na"), col("nb")).cast("bigint"))
      .filter(col("dist") <= K)
      .select(col("ent_a"), col("ent_b"), col("dist"))
      .orderBy(col("ent_a"), col("ent_b"))
  }

  /** GRADED (r10): the SAME exact join via PASS-JOIN segment keys —
    * the partition-based family (Li/Deng/Feng, "PASS-JOIN: a
    * partition-based method for similarity joins", VLDB 2011) beside
    * the Gravano q-gram prefix filter above. For k = 1 the pigeonhole
    * is two segments: align the pair on the SHORTER length s and set
    * m = s div 2 — a single edit either lies past position m (both
    * length-m PREFIXES equal) or at/before it (both length-(s−m)
    * SUFFIXES equal, end-aligned). Each entity therefore emits 4 keys
    * — (role length l ∈ {len, len−1}) × (P = first l div 2 chars,
    * S = last l − l div 2 chars) — and candidates are EXACT string
    * equality on ~half-name segments. l-key equality subsumes the
    * ||a|−|b|| ≤ 1 length filter.
    *
    * Why it exists next to `fuzzy_join_qgram`: q-gram selectivity is
    * bounded by the gram vocabulary, and over this corpus's small
    * character alphabet the q = 3 prefix join still emits ~850k
    * candidates at sf0.1; half-name segments are near-unique, so the
    * candidate set collapses to ~the true pair set (spec-audited ≥5×
    * sparser than the q-gram candidates). Same naive-levenshtein
    * oracle; [[graft.EditJoinSpec]] proves ≡ brute force AND ≡ the
    * q-gram join row-for-row. */
  def fuzzyJoinPassjoin(spark: SparkSession, dir: String): DataFrame = {
    val ents = entities(spark, dir)
    val keys = segmentKeys(ents)
    // same r12 restructure as the q-gram chain: names ride the segment
    // keys, verify runs on the raw key-join output, distinct only the
    // verified (near-true) pair set — two name joins and one
    // candidate-granularity exchange removed (§2.3/§2.4).
    keys.as("a").join(keys.as("b"),
        col("a.l") === col("b.l") && col("a.kind") === col("b.kind") &&
          col("a.seg") === col("b.seg") &&
          col("a.ent_id") < col("b.ent_id"))
      .select(col("a.ent_id").as("ent_a"), col("b.ent_id").as("ent_b"),
        col("a.name").as("na"), col("b.name").as("nb"))
      .withColumn("dist", levenshtein(col("na"), col("nb")).cast("bigint"))
      .filter(col("dist") <= K)
      .select(col("ent_a"), col("ent_b"), col("dist"))
      .distinct()
      .orderBy(col("ent_a"), col("ent_b"))
  }

  /** The 4 segment keys per entity (see [[fuzzyJoinPassjoin]]). */
  private def segmentKeys(ents: DataFrame): DataFrame =
    ents
      .select(col("ent_id"), col("name"), length(col("name")).as("len"))
      .select(col("ent_id"), col("name"), col("len"),
        explode(expr("filter(array(len, len - 1), x -> x >= 1)")).as("l"))
      .select(col("ent_id"), col("name"), col("l"),
        explode(array(
          struct(lit("P").as("kind"),
            expr("substring(name, 1, l div 2)").as("seg")),
          struct(lit("S").as("kind"),
            expr("substring(name, len - (l - l div 2) + 1, " +
              "l - l div 2)").as("seg")))).as("ks"))
      .select(col("ent_id"), col("name"), col("l"),
        col("ks.kind").as("kind"), col("ks.seg").as("seg"))

  /** Pass-join candidate count for the selectivity audit. */
  private[graft] def passjoinCandidateCount(spark: SparkSession,
      dir: String): Long = {
    val keys = segmentKeys(entities(spark, dir))
    keys.as("a").join(keys.as("b"),
        col("a.l") === col("b.l") && col("a.kind") === col("b.kind") &&
          col("a.seg") === col("b.seg") &&
          col("a.ent_id") < col("b.ent_id"))
      .select(col("a.ent_id"), col("b.ent_id")).distinct().count()
  }

  /** Candidate count for the selectivity audit ([[graft.EditJoinSpec]]). */
  private[graft] def candidateCount(spark: SparkSession, dir: String): Long = {
    val bag = gramBag(entities(spark, dir))
    val dfreq = bag.groupBy(col("g"), col("occ"))
      .agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("ent_id"))
      .orderBy(col("df"), col("g"), col("occ"))
    val pref = bag.join(dfreq, Seq("g", "occ"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= PrefixLen)
      .select(col("ent_id"), col("g"), col("occ"), col("len"))
    pref.as("a").join(pref.as("b"),
        col("a.g") === col("b.g") && col("a.occ") === col("b.occ") &&
          col("a.ent_id") < col("b.ent_id") &&
          abs(col("a.len") - col("b.len")) <= K)
      .select(col("a.ent_id"), col("b.ent_id")).distinct().count()
  }

  /** GRADED (r10): the SAME exact join via SYMSPELL DELETE
    * NEIGHBORHOODS (Garbe's SymSpell, the spell-checker-index
    * standard) — the third indexing family beside q-gram prefixes and
    * PASS-JOIN segments: each name's key set is the name itself plus
    * every single-character deletion. Losslessness for k = 1 is a
    * 3-case argument: equal names share the full key; an insertion
    * pair (b = a + 1 char) collides on a's full key = one of b's
    * delete keys (deletion symmetric); a substitution pair collides
    * on the two deletions at the edited position. The trade is
    * key FAN-OUT for SELECTIVITY: O(len) keys per name (vs 4 prefix
    * elements / 2 segments) against a delete-key vocabulary so large
    * that candidate collisions are near-minimal — the dial a 100 TB
    * spell index turns when verify dominates. Hot keys are bounded by
    * name frequency (exact duplicates collapse upstream in the dedup
    * tier); verify is the same bounded levenshtein. */
  def fuzzyJoinSymspell(spark: SparkSession, dir: String): DataFrame = {
    val ents = entities(spark, dir)
    // same r12 restructure: the name rides the delete keys (it is
    // functionally dependent on ent_id, so the key distinct is
    // unchanged), verify runs on the raw key-join output, distinct only
    // the verified pair set (§2.3/§2.4).
    val keys = ents
      .select(col("ent_id"), col("name"), length(col("name")).as("len"),
        explode(expr(
          "transform(sequence(0, length(name)), i -> " +
            "CASE WHEN i = 0 THEN name " +
            "ELSE concat(substring(name, 1, i - 1), substring(name, i + 1)) " +
            "END)")).as("k"))
      .distinct()
    keys.as("a").join(keys.as("b"),
        col("a.k") === col("b.k") &&
          col("a.ent_id") < col("b.ent_id") &&
          abs(col("a.len") - col("b.len")) <= K)
      .select(col("a.ent_id").as("ent_a"), col("b.ent_id").as("ent_b"),
        col("a.name").as("na"), col("b.name").as("nb"))
      .withColumn("dist", levenshtein(col("na"), col("nb")).cast("bigint"))
      .filter(col("dist") <= K)
      .select(col("ent_a"), col("ent_b"), col("dist"))
      .distinct()
      .orderBy(col("ent_a"), col("ent_b"))
  }

  /** Candidate-pair count of the SymSpell chain (pre-verify) — the
    * spec compares selectivity across the three index families. */
  private[graft] def symspellCandidateCount(spark: SparkSession,
      dir: String): Long = {
    val ents = entities(spark, dir)
    val keys = ents
      .select(col("ent_id"), length(col("name")).as("len"),
        explode(expr(
          "transform(sequence(0, length(name)), i -> " +
            "CASE WHEN i = 0 THEN name " +
            "ELSE concat(substring(name, 1, i - 1), substring(name, i + 1)) " +
            "END)")).as("k"))
      .distinct()
    keys.as("a").join(keys.as("b"),
        col("a.k") === col("b.k") &&
          col("a.ent_id") < col("b.ent_id") &&
          abs(col("a.len") - col("b.len")) <= K)
      .select(col("a.ent_id"), col("b.ent_id")).distinct().count()
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fuzzy_join_qgram" -> (fuzzyJoinQgram(_, _)),
    "fuzzy_join_passjoin" -> (fuzzyJoinPassjoin(_, _)),
    "fuzzy_join_symspell" -> (fuzzyJoinSymspell(_, _)))

  /** Oracle: the NAIVE quadratic levenshtein join over the same
    * entity construction — no gram machinery; hash equality proves
    * the prefix/length/verify chain lossless. */
  private val naiveLevenshteinSql =
      s"""WITH toks AS (
         |  SELECT doc_id,
         |    list_filter(string_split(text, ' '), x -> x <> '') AS t
         |  FROM documents),
         |base AS (
         |  SELECT doc_id,
         |    lower(t[1] || ' ' || t[2] || ' ' || t[3]) AS name
         |  FROM toks WHERE len(t) >= 3),
         |p AS (
         |  SELECT doc_id, name,
         |    ((strpos('0123456789abcdef',
         |        substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)
         |      % len(name)) + 1 AS pos
         |  FROM base
         |  WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8'),
         |dirty AS (
         |  SELECT doc_id + 10000000 AS ent_id,
         |    substr(name, 1, pos - 1) || substr(name, pos + 1) AS name
         |  FROM p),
         |ents AS (
         |  SELECT doc_id AS ent_id, name FROM base
         |  UNION ALL SELECT ent_id, name FROM dirty)
         |SELECT a.ent_id AS ent_a, b.ent_id AS ent_b,
         |  CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
         |FROM ents a JOIN ents b
         |  ON a.ent_id < b.ent_id AND levenshtein(a.name, b.name) <= $K
         |ORDER BY ent_a, ent_b""".stripMargin

  val oracles: Map[String, String] = Map(
    "fuzzy_join_qgram" -> naiveLevenshteinSql,
    // the same naive quadratic ground truth — it is already fully
    // independent of all THREE filter chains
    "fuzzy_join_passjoin" -> naiveLevenshteinSql,
    "fuzzy_join_symspell" -> naiveLevenshteinSql)
}
