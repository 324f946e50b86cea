package graft.queries

/** Shared SQL fragments for the text/dedup operators, written once in
  * each dialect so the Spark plan and the DuckDB oracle compute the
  * *same* deterministic values (SURVEY §5.1 hash-match discipline).
  *
  * The engine-portable hash is an md5 hex prefix parsed as an
  * integer: md5 is bit-identical everywhere, and both engines can
  * parse hex (`conv(,16,10)` in Spark, `('0x'||x)::BIGINT` in
  * DuckDB). Prefix lengths are chosen so downstream arithmetic stays
  * inside non-overflowing BIGINT range (products of two 28/29-bit
  * values < 2^58). At 100 TB the same operators would swap in
  * `xxhash64` (codegen'd, no hex round-trip) — the md5 path is the
  * cross-engine-verifiable twin.
  */
object TextKit {
  /** Whitespace tokens of lower(text), empty strings dropped.
    * DuckDB twin: list_filter(string_split(lower(text),' '), t->t<>''). */
  val toks = "filter(split(lower(text), ' '), t -> t <> '')"
  val toksDuck = "list_filter(string_split(lower(text),' '), t -> t <> '')"

  /** Word 3-gram shingles over a token-array column `w` (distinct set).
    * Word trigrams are the dedup shingle: near-unique per document
    * (measured doc-frequency ≈ 1.6 on the corpus) so the
    * shared-shingle candidate join stays near-linear, while exact
    * copies keep Jaccard ≈ 1. */
  def shingles3(w: String): String =
    s"""array_distinct(if(size($w) < 3, array(),
       |  transform(sequence(1, size($w) - 2),
       |    i -> concat_ws(' ', element_at($w, i), element_at($w, i + 1),
       |                        element_at($w, i + 2)))))""".stripMargin
  def shingles3Duck(w: String): String =
    s"list_distinct([$w[i]||' '||$w[i+1]||' '||$w[i+2] for i in range(1, len($w) - 1)])"

  /** Word n-gram shingles over a token-array column `w`, generalized
    * form of [[shingles3]] (kept verbatim for the queries that cite
    * its measured doc-frequency). `distinct = false` keeps duplicate
    * grams — required by repetition scoring, where the duplicate
    * count IS the signal. */
  def shinglesN(w: String, n: Int, distinct: Boolean): String = {
    val parts = (0 until n)
      .map(j => if (j == 0) s"element_at($w, i)" else s"element_at($w, i + $j)")
      .mkString(", ")
    val core = s"if(size($w) < $n, array(), " +
      s"transform(sequence(1, size($w) - ${n - 1}), i -> concat_ws(' ', $parts)))"
    if (distinct) s"array_distinct($core)" else core
  }
  def shinglesNDuck(w: String, n: Int, distinct: Boolean): String = {
    val parts = (0 until n)
      .map(j => if (j == 0) s"$w[i]" else s"$w[i + $j]")
      .mkString(" || ' ' || ")
    // duckdb range(1, hi) is empty when hi <= 1, covering len(w) < n.
    val core = s"[$parts for i in range(1, len($w) - ${n - 2})]"
    if (distinct) s"list_distinct($core)" else core
  }

  /** 28-bit base hash (7 md5 hex chars). */
  def h28(e: String): String = s"CAST(conv(substr(md5($e), 1, 7), 16, 10) AS BIGINT)"
  def h28Duck(e: String): String = s"('0x' || substr(md5($e), 1, 7))::BIGINT"

  /** 60-bit hash (15 md5 hex chars) — fits signed BIGINT. */
  def h60(e: String): String = s"CAST(conv(substr(md5($e), 1, 15), 16, 10) AS BIGINT)"
  def h60Duck(e: String): String = s"('0x' || substr(md5($e), 1, 15))::BIGINT"

  /** PREFIX-FILTERED candidate CTEs over a prior `sh(doc_id, s)` CTE
    * — the BOUNDED oracle form of the brute-force cross join
    * (round-11 verdict #4), mirroring the ENGINE's PPJoin lemma
    * (DedupStages.prefixCandidates) in DuckDB SQL. Under any fixed
    * total order of shingles (here ascending document frequency,
    * then shingle — rarest first), two sets with Jaccard ≥ τ MUST
    * share an element within their first |X| − ⌈τ·|X|⌉ + 1 shingles,
    * so only those prefix shingles are indexed for the equi-join and
    * the frequent shingles that drive Σdf² candidate blowup never
    * enter the index (the first bounded-oracle attempt — plain
    * any-shared-shingle — filled DuckDB's spill disk at sf1.0 on
    * exactly those). The lemma holds for ANY consistent order, so an
    * engine-vs-oracle tie-break difference only changes the
    * candidate SUPERSET, never the final answer: the caller's
    * predicate re-verifies every candidate, making the rewrite
    * answer-identical to the brute force. `ordered = true` adds the
    * symmetric size-compat filter (τ·|A| ≤ |B| ≤ |A|/τ, sound for
    * Jaccard) and emits unordered pairs; `ordered = false` is the
    * ASYMMETRIC containment shape — prefix(A) joined against B's
    * FULL postings, no size filter, both directions. */
  def prefixCandDuck(tau: Double, ordered: Boolean,
      name: String = "cand"): String = {
    val base =
      s"""${name}_ex AS MATERIALIZED (SELECT doc_id, len(s) AS n, unnest(s) AS t FROM sh),
         |${name}_freq AS MATERIALIZED (SELECT t, count(*) AS df FROM ${name}_ex GROUP BY t),
         |${name}_pref AS MATERIALIZED (SELECT doc_id, n, t FROM (
         |    SELECT e.doc_id, e.n, e.t,
         |      row_number() OVER (PARTITION BY e.doc_id ORDER BY f.df, e.t)
         |        AS rk
         |    FROM ${name}_ex e JOIN ${name}_freq f USING (t)) p
         |  WHERE rk <= n - ceil(n * $tau) + 1)""".stripMargin
    val join =
      if (ordered)
        s"""$name AS MATERIALIZED (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
           |  FROM ${name}_pref a JOIN ${name}_pref b
           |    ON a.t = b.t AND a.doc_id < b.doc_id
           |    AND a.n * $tau <= b.n AND b.n * $tau <= a.n)""".stripMargin
      else
        s"""$name AS MATERIALIZED (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
           |  FROM ${name}_pref a JOIN ${name}_ex b
           |    ON a.t = b.t AND a.doc_id <> b.doc_id)""".stripMargin
    base + ",\n" + join
  }

  /** Verified Jaccard over [[prefixCandDuck]]'s candidates as an
    * UNNEST-JOIN COUNT: ix = |A∩B| via a candidate-scoped
    * (doc, shingle) equi-join + group count, instead of a per-pair
    * `list_intersect` — DuckDB evaluates list_intersect as an
    * O(|A|·|B|) nested loop per pair, which at sf1.0's 19 M
    * candidates × ~53-element sets is ~5·10¹⁰ string comparisons
    * (the jaccardDuck form burned 45+ min; this joins-and-counts the
    * same integer in ~6 min at 16 threads). On distinct shingle sets
    * the shared-shingle count IS len(list_intersect), so
    * jac = ix/(na+nb−ix) is the identical rational and the 6 dp
    * round matches cell-for-cell. Emits `{out}_ix` and `{out}`
    * (id1, id2, na, nb, jac); candidates sharing zero shingles
    * cannot exist (a candidate shares a prefix shingle by
    * construction), so the inner join drops nothing the τ > 0
    * filter would keep. */
  def jaccardPairsDuck(name: String = "cand", out: String = "p"): String =
    s"""${out}_ix AS MATERIALIZED (SELECT c.id1, c.id2,
       |    a.n AS na, b.n AS nb, count(*) AS ix
       |  FROM $name c JOIN ${name}_ex a ON a.doc_id = c.id1
       |  JOIN ${name}_ex b ON b.doc_id = c.id2 AND b.t = a.t
       |  GROUP BY c.id1, c.id2, a.n, b.n),
       |$out AS (SELECT id1, id2, na, nb,
       |    round(ix::DOUBLE / (na + nb - ix), 6) AS jac,
       |    round(ix::DOUBLE / na, 6) AS cont FROM ${out}_ix)""".stripMargin

  /** Jaccard of two array columns, computed identically on both
    * sides: |∩| / (|a| + |b| - |∩|), all-integer until one double
    * division (bit-identical across engines). */
  def jaccard(a: String, b: String): String =
    s"CAST(size(array_intersect($a, $b)) AS DOUBLE) / (size($a) + size($b) - size(array_intersect($a, $b)))"
  def jaccardDuck(a: String, b: String): String =
    s"len(list_intersect($a, $b))::DOUBLE / (len($a) + len($b) - len(list_intersect($a, $b)))"
}
