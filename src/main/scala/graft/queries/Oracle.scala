package graft.queries

/** DuckDB oracle SQL — one string per oracle-checkable query id,
  * SURVEY.md §2. Each statement is the exact semantic twin of its
  * Spark implementation, written to the cross-engine parity rules of
  * SURVEY.md §7.4:
  *   O: identical ORDER BY on a unique key;
  *   F: ROUND every float aggregate identically; vector math in DOUBLE
  *      (never DuckDB's float32 list_dot_product);
  *   T: event time via epoch_us(ts) == Spark `unix_micros(cast(ts as timestamp))` at UTC;
  *   I: CAST(SUM(int) AS BIGINT) — DuckDB sums integers to HUGEINT;
  *      CAST year/quarter/length/row_number to INT to match Spark;
  *   N: identical output aliases;
  *   S: string_split(text, ' ') == Spark split on this corpus.
  * Table names are bare (driver resolves them to the sfDir parquet).
  */
object Oracle {
  /** q_asof_join's oracle: ROWS frame over (us, event_id) — the exact
    * twin of the window composition. q_asof_native gets its own RANGE
    * variant below: the custom operator matches ANY same-us click, so
    * a ROWS frame would diverge on a same-(user, us) click/error
    * collision (none in this data, but the oracle must encode the
    * operator's semantics, not the data's current gaps). */
  private val asofSql =
    """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
      |m AS (SELECT user_id, event_id, event_type, us,
      |             MAX(CASE WHEN event_type = 'click' THEN us END)
      |               OVER (PARTITION BY user_id ORDER BY us, event_id
      |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_us
      |      FROM e)
      |SELECT user_id, event_id, COALESCE(us - last_click_us, -1) AS gap_us
      |FROM m WHERE event_type = 'error' ORDER BY user_id, event_id""".stripMargin

  /** Shared CTE chain of the word-3-gram Jaccard pair graph — used by
    * q_dedup_ngram (the pairs) and q_dedup_cluster (connected
    * components over them). */
  private val ngramCtes =
    """toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
      |              WHERE len(string_split(text, ' ')) >= 3),
      |grams AS (SELECT DISTINCT doc_id,
      |                 unnest(list_transform(generate_series(1, CAST(len(t) AS INT) - 2),
      |                        i -> array_to_string(t[i:i+2], ' '))) AS gram
      |          FROM toks),
      |sizes AS (SELECT doc_id, COUNT(*) AS n_grams FROM grams GROUP BY doc_id),
      |common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
      |           FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
      |           GROUP BY 1, 2),
      |scored AS (SELECT doc_a, doc_b,
      |                  ROUND(common * 1.0 / (sa.n_grams + sb.n_grams - common), 3) AS jaccard
      |           FROM common JOIN sizes sa ON doc_a = sa.doc_id
      |                       JOIN sizes sb ON doc_b = sb.doc_id
      |           WHERE common * 9 >= 4 * (sa.n_grams + sb.n_grams))""".stripMargin

  /** Shared CTE prefix of the graph queries: the significant
    * co-purchase edge list (canonical a < b, co-occurrence count ≥ 2 —
    * the GraphOps.coPurchaseEdges twin). */
  private val coPurchaseCtes =
    """po AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      |e AS (SELECT a.pk AS a, b.pk AS b FROM po a JOIN po b
      |      ON a.ok = b.ok AND a.pk < b.pk
      |      GROUP BY 1, 2 HAVING COUNT(*) >= 2)""".stripMargin

  /** q_pagerank's oracle: DuckDB cannot aggregate over a recursive
    * reference, so the 10 damped power iterations are UNROLLED as 10
    * chained CTEs — each the exact twin of one Spark join-agg step.
    * `(1 - 0.85)` is written as the expression (not 0.15) so both
    * engines feed the identical IEEE teleport constant. */
  private val pagerankSql: String = {
    val iters = (1 to 10).map { i =>
      s"""r$i AS (SELECT adj.dst AS node,
         |            (1 - 0.85) / (SELECT n FROM nn) +
         |            0.85 * SUM(r${i - 1}.rank / adj.outdeg) AS rank
         |        FROM adj JOIN r${i - 1} ON r${i - 1}.node = adj.src
         |        GROUP BY adj.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH $coPurchaseCtes,
       |adj0 AS (SELECT a AS src, b AS dst FROM e UNION ALL SELECT b, a FROM e),
       |od AS (SELECT src, COUNT(*) AS outdeg FROM adj0 GROUP BY src),
       |adj AS (SELECT adj0.src, adj0.dst, od.outdeg FROM adj0
       |        JOIN od ON od.src = adj0.src),
       |nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM od),
       |r0 AS (SELECT src AS node, 1.0 / (SELECT n FROM nn) AS rank FROM od),
       |$iters
       |SELECT node AS part, ROUND(rank, 7) AS rank FROM r10 ORDER BY part""".stripMargin
  }

  /** q_communities' oracle: 5 synchronous label-propagation rounds
    * UNROLLED (the pagerank stance — each layer is the exact SQL
    * twin of one Spark round), argmax stated as count DESC, label
    * ASC. AS MATERIALIZED on each layer: every round references the
    * previous label table once per adjacency side and inlining would
    * re-expand the chain exponentially. */
  private val communitiesSql: String = {
    val rounds = (1 to 5).map { i =>
      s"""l$i AS MATERIALIZED (
         |  SELECT src AS node, nl AS label FROM (
         |    SELECT adj.src, l${i - 1}.label AS nl, COUNT(*) AS cnt,
         |           ROW_NUMBER() OVER (PARTITION BY adj.src
         |             ORDER BY COUNT(*) DESC, l${i - 1}.label ASC) AS rk
         |    FROM adj JOIN l${i - 1} ON l${i - 1}.node = adj.dst
         |    GROUP BY adj.src, l${i - 1}.label) t
         |  WHERE rk = 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH $coPurchaseCtes,
       |adj AS (SELECT a AS src, b AS dst FROM e UNION ALL SELECT b, a FROM e),
       |l0 AS (SELECT DISTINCT src AS node, src AS label FROM adj),
       |$rounds
       |SELECT label AS community, CAST(COUNT(*) AS BIGINT) AS n_parts
       |FROM l5 GROUP BY label ORDER BY community""".stripMargin
  }

  /** q_kcore's oracle: peeling removes rows, which a (monotone,
    * append-only) recursive CTE cannot express, so 10 peel rounds are
    * UNROLLED — each the exact twin of one Spark round (degree filter
    * + edge restriction). The Spark facade requires convergence
    * within the same 10 rounds (loud failure), and rounds past the
    * fixpoint are no-ops, so equality is exact. */
  private val kcoreSql: String = {
    // AS MATERIALIZED is load-bearing: every round references the
    // previous edge set THREE times (degree union ×2 + restriction),
    // so plain inlined CTEs expand 3^10 ways and exhaust file handles
    // re-opening the parquet scan
    val rounds = (1 to 10).map { i =>
      s"""d$i AS MATERIALIZED (SELECT v FROM (SELECT a AS v FROM e${i - 1} UNION ALL SELECT b FROM e${i - 1})
         |       GROUP BY v HAVING COUNT(*) >= 2),
         |e$i AS MATERIALIZED (SELECT a, b FROM e${i - 1}
         |       WHERE a IN (SELECT v FROM d$i) AND b IN (SELECT v FROM d$i))""".stripMargin
    }.mkString(",\n")
    s"""WITH $coPurchaseCtes,
       |e0 AS MATERIALIZED (SELECT a, b FROM e),
       |$rounds
       |SELECT v AS part, CAST(COUNT(*) AS BIGINT) AS core_deg
       |FROM (SELECT a AS v FROM e10 UNION ALL SELECT b FROM e10)
       |GROUP BY v ORDER BY part""".stripMargin
  }

  /** q_bpe_encode's oracle, generated stage-by-stage (the kcoreSql
    * loop precedent): BPE training is an ITERATIVE argmax —
    * inexpressible as one static aggregate — but each iteration is
    * plain SQL (pair counts from the wrapped-symbol form, `ORDER BY
    * cnt DESC, pat LIMIT 1`, one `replace`), so `nMerges` chained CTE
    * stages restate the whole loop. AS MATERIALIZED is load-bearing
    * again: every t$i scalar is referenced by v$i AND the final encode
    * chain, and each v$i chains the full prefix — inlined, the
    * expansion is exponential in nMerges. The final chain re-encodes
    * every token OCCURRENCE exactly like the Spark side's row-local
    * [[graft.Graft.bpeEncode]]; an exhausted stage (no pairs left)
    * yields an empty t$i and COALESCE(chr(1)) turns its replace into
    * the identity — the Scala learner's early-stop twin. */
  /** The shared WITH-prefix of both BPE oracles: the vocab cut, the
    * wrapped-symbol seed, and `nMerges` training stages (t$i = the
    * stage's chosen merge, v$i = the vocab rewritten under it). */
  private def bpeStages(nMerges: Int, vocabLimit: Int): String = {
    val stages = (1 to nMerges).map { i =>
      s"""sy$i AS (SELECT freq, string_split(trim(s, '()'), ')(') AS y FROM v${i - 1}),
         |p$i AS (SELECT freq,
         |  unnest(list_transform(generate_series(1, CAST(len(y) AS INT) - 1),
         |         j -> '(' || y[j] || ')(' || y[j+1] || ')')) AS pat,
         |  unnest(list_transform(generate_series(1, CAST(len(y) AS INT) - 1),
         |         j -> '(' || y[j] || y[j+1] || ')')) AS mrg
         |  FROM sy$i),
         |t$i AS MATERIALIZED (SELECT pat, mrg FROM
         |  (SELECT pat, mrg, SUM(freq) AS cnt FROM p$i GROUP BY 1, 2)
         |  ORDER BY cnt DESC, pat LIMIT 1),
         |v$i AS MATERIALIZED (SELECT word, freq,
         |  replace(s, COALESCE((SELECT pat FROM t$i), chr(1)),
         |             COALESCE((SELECT mrg FROM t$i), chr(1))) AS s
         |  FROM v${i - 1})""".stripMargin
    }.mkString(",\n")
    s"""WITH w0 AS (SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE w <> '' GROUP BY 1 ORDER BY freq DESC, word LIMIT $vocabLimit),
       |v0 AS (SELECT word, freq, regexp_replace(word, '(?s)(.)', '(\\1)', 'g') AS s FROM w0),
       |$stages""".stripMargin
  }

  /** The five urlCanonicalize passes as chained CTEs c0..c4 over a
    * prior CTE `m` carrying (<carry cols>, url); c4 exposes the carry
    * columns plus url and canon. ONE definition site for the SQL twin
    * of `Graft.urlCanonicalize` — the q_url_canon and q_dedup_url
    * oracles both chain through it, so an algorithm change can never
    * drift between them. */
  private def urlCanonCtes(carry: String): String =
    s"""c0 AS (SELECT $carry, url,
       |              regexp_extract(url, '^[a-zA-Z]+://[^/:?]*', 0) AS pre
       |       FROM m),
       |c1 AS (SELECT $carry, url, pre,
       |              substr(url, length(pre) + 1) AS rest FROM c0),
       |c2 AS (SELECT $carry, url,
       |              lower(pre) ||
       |              CASE WHEN lower(pre) LIKE 'https://%'
       |                    AND regexp_matches(rest, '^:443(/|\\?|\\z)')
       |                   THEN substr(rest, 5) ELSE rest END AS folded
       |       FROM c1),
       |c3 AS (SELECT $carry, url,
       |              regexp_replace(regexp_replace(regexp_replace(folded,
       |                '&utm_[a-z_]+=[^&]*', '', 'g'),
       |                '\\?utm_[a-z_]+=[^&]*&', '?', 'g'),
       |                '\\?utm_[a-z_]+=[^&]*\\z', '', 'g') AS nu
       |       FROM c2),
       |c4 AS (SELECT $carry, url,
       |              regexp_replace(regexp_extract(nu, '^[^?]*', 0),
       |                             '/\\z', '', 'g') ||
       |              substr(nu, length(regexp_extract(nu, '^[^?]*', 0)) + 1)
       |                AS canon
       |       FROM c3)""".stripMargin
  // NOTE: no line in this helper may BEGIN with '||' — the caller's
  // outer .stripMargin would strip one pipe from it (double-strip).

  /** The wrapped-form encode chain — one `replace` per learned merge,
    * shared by the q_bpe_encode and q_tokenizer_fertility oracles. */
  private def bpeChain(nMerges: Int): String =
    (1 to nMerges).foldLeft(
      "regexp_replace(w, '(?s)(.)', '(\\1)', 'g')") { (acc, i) =>
      s"replace($acc, COALESCE((SELECT pat FROM t$i), chr(1)), " +
        s"COALESCE((SELECT mrg FROM t$i), chr(1)))"
    }

  private def bpeSql(nMerges: Int, vocabLimit: Int): String = {
    val chain = bpeChain(nMerges)
    s"""${bpeStages(nMerges, vocabLimit)},
       |tok AS (SELECT source, w FROM
       |  (SELECT source, unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE w <> ''),
       |enc AS (SELECT source, length(w) AS nc, $chain AS s FROM tok)
       |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_words,
       |       CAST(SUM(nc) AS BIGINT) AS n_char_syms,
       |       CAST(SUM(length(s) - length(replace(s, '(', ''))) AS BIGINT) AS n_bpe_tokens,
       |       CAST((SUM(nc) - SUM(length(s) - length(replace(s, '(', '')))) * 1000
       |            // SUM(nc) AS BIGINT) AS saved_permille
       |FROM enc GROUP BY source ORDER BY source""".stripMargin
  }

  /** q_tokenizer_fertility's oracle: the SAME 12-merge training CTEs,
    * the same wrapped-form encode chain, rolled up per LANG with the
    * integer fertility permille (rule I). */
  private def bpeFertilitySql(nMerges: Int, vocabLimit: Int): String =
    s"""${bpeStages(nMerges, vocabLimit)},
       |tok AS (SELECT lang, w FROM
       |  (SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE w <> ''),
       |enc AS (SELECT lang, ${bpeChain(nMerges)} AS s FROM tok)
       |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_words,
       |       CAST(SUM(length(s) - length(replace(s, '(', ''))) AS BIGINT)
       |         AS n_bpe_tokens,
       |       CAST(SUM(length(s) - length(replace(s, '(', ''))) * 1000
       |            // COUNT(*) AS BIGINT) AS fertility_permille
       |FROM enc GROUP BY lang ORDER BY lang""".stripMargin

  /** q_bpe_vocab's oracle: the learned merge table itself, one row
    * per training stage — each t$i unwrapped back to (lhs, rhs,
    * merged). An exhausted stage contributes no row, the Scala
    * learner's early-stop twin. */
  private def bpeVocabSql(nMerges: Int, vocabLimit: Int): String = {
    val rows = (1 to nMerges).map { i =>
      s"""SELECT CAST($i AS BIGINT) AS step, y[1] AS lhs, y[2] AS rhs,
         |  trim(mrg, '()') AS merged
         |FROM (SELECT string_split(trim(pat, '()'), ')(') AS y, mrg FROM t$i)""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""${bpeStages(nMerges, vocabLimit)}
       |SELECT * FROM (
       |$rows
       |) ORDER BY step""".stripMargin
  }

  val sql: Map[String, String] = Map(

    "q_scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_extendedprice LIMIT 100""".stripMargin,

    "q_filter_range" ->
      """SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 30""".stripMargin,

    "q_case_band" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders,
        |       CAST(SUM(CASE WHEN o_totalprice > 100000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_join_broadcast" ->
      """SELECT r_name, COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS total_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "q_join_shuffle" ->
      """SELECT o_orderstatus, COUNT(*) AS n_rows,
        |       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_join_multiway" ->
      """SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q_join_outer" ->
      """SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin,

    "q_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,

    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,

    "q_join_theta" ->
      """SELECT p_brand, COUNT(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey AND l_quantity > p_size
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    // the bloom sketch is exact-result-preserving (false positives are
    // removed by the semi join behind it), so the oracle is the plain
    // IN-subquery semi join
    "q_bloom_join" ->
      """SELECT l_suppkey, COUNT(*) AS n_lines,
        |       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |WHERE l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_acctbal > 4000)
        |GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin,

    // salting only splinters shuffle buckets; row-level results equal
    // the unsalted inner join
    "q_skew_join" ->
      """SELECT p_brand, COUNT(*) AS n_lines, ROUND(SUM(l_quantity), 2) AS sum_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |       ROUND(SUM(l_quantity), 2) AS sum_qty,
        |       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
        |       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |       ROUND(AVG(l_quantity), 2) AS avg_qty,
        |       ROUND(AVG(l_extendedprice), 2) AS avg_price,
        |       COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_agg_having" ->
      """SELECT o_custkey, COUNT(*) AS n_orders, ROUND(MAX(o_totalprice), 2) AS max_price
        |FROM orders GROUP BY o_custkey HAVING COUNT(*) > 5 ORDER BY o_custkey""".stripMargin,

    "q_distinct_count" ->
      """SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_cust
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_rollup" ->
      """SELECT COALESCE(CAST(year(o_orderdate) AS INT), -1) AS o_year,
        |       COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
        |       COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS total_price,
        |       CAST(GROUPING(year(o_orderdate), o_orderpriority) AS BIGINT) AS gid
        |FROM orders GROUP BY ROLLUP(year(o_orderdate), o_orderpriority)
        |ORDER BY gid, o_year, o_orderpriority""".stripMargin,

    "q_grouping_sets" ->
      """SELECT COALESCE(CAST(year(o_orderdate) AS INT), -1) AS o_year,
        |       COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
        |       COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS total_price,
        |       CAST(GROUPING(year(o_orderdate), o_orderpriority) AS BIGINT) AS gid
        |FROM orders
        |GROUP BY GROUPING SETS ((year(o_orderdate), o_orderpriority), (o_orderpriority), ())
        |ORDER BY gid, o_year, o_orderpriority""".stripMargin,

    "q_listagg" ->
      """SELECT r_name,
        |       string_agg(n_name, ',' ORDER BY n_name) AS nations,
        |       COUNT(*) AS n_nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "q_cube" ->
      """SELECT COALESCE(CAST(year(o_orderdate) AS INT), -1) AS o_year,
        |       COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
        |       COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS total_price,
        |       CAST(GROUPING(year(o_orderdate), o_orderpriority) AS BIGINT) AS gid
        |FROM orders GROUP BY CUBE(year(o_orderdate), o_orderpriority)
        |ORDER BY gid, o_year, o_orderpriority""".stripMargin,

    "q_percentile" ->
      """SELECT o_orderpriority,
        |       ROUND(quantile_cont(o_totalprice, 0.5), 2) AS median_price,
        |       ROUND(quantile_cont(o_totalprice, 0.9), 2) AS p90_price
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_bool_bit_agg" ->
      """SELECT o_orderpriority,
        |       bool_and(o_totalprice > 1000) AS all_over_1k,
        |       bool_or(o_totalprice > 400000) AS any_over_400k,
        |       CAST(bit_and(o_custkey) AS BIGINT) AS key_and,
        |       CAST(bit_or(o_custkey) AS BIGINT) AS key_or,
        |       CAST(bit_xor(o_custkey) AS BIGINT) AS key_xor
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_stats_agg" ->
      """SELECT l_returnflag,
        |       ROUND(stddev_samp(l_quantity), 4) AS sd_qty,
        |       ROUND(var_samp(l_discount), 6) AS var_disc,
        |       ROUND(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
        |       ROUND(covar_samp(l_quantity, l_discount), 6) AS covar_qty_disc
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // winsorized mean: quantile_cont ≡ Spark percentile (the
    // q_percentile parity), window bounds shared with the aggregate
    "q_winsorize" ->
      """WITH w AS (SELECT o_orderpriority, o_totalprice,
        |                  quantile_cont(o_totalprice, 0.05)
        |                    OVER (PARTITION BY o_orderpriority) AS lo,
        |                  quantile_cont(o_totalprice, 0.95)
        |                    OVER (PARTITION BY o_orderpriority) AS hi
        |           FROM orders)
        |SELECT o_orderpriority,
        |       ROUND(AVG(LEAST(GREATEST(o_totalprice, lo), hi)), 2) AS wins_mean,
        |       CAST(SUM(CASE WHEN o_totalprice < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_lo,
        |       CAST(SUM(CASE WHEN o_totalprice > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_hi
        |FROM w GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_pivot" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        |       CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
        |       CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
        |       CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS n_medium,
        |       CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS n_notspec,
        |       CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS n_low
        |FROM orders GROUP BY 1 ORDER BY o_year""".stripMargin,

    // unpivot: aggregate first, melt the tiny result (the Spark side's
    // scale order); DuckDB's UNPIVOT names match Spark's
    // variable/value column names
    "q_unpivot" ->
      """WITH agg AS (SELECT l_returnflag,
        |                    ROUND(SUM(l_quantity), 2) AS quantity,
        |                    ROUND(SUM(l_extendedprice), 2) AS extendedprice,
        |                    ROUND(SUM(l_discount), 2) AS discount
        |             FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, measure, total
        |FROM agg UNPIVOT (total FOR measure IN (quantity, extendedprice, discount))
        |ORDER BY l_returnflag, measure""".stripMargin,

    "q_histogram" ->
      """SELECT CAST(FLOOR(o_totalprice / 25000) AS BIGINT) AS bin,
        |       COUNT(*) AS n_orders,
        |       ROUND(MIN(o_totalprice), 2) AS min_price,
        |       ROUND(MAX(o_totalprice), 2) AS max_price
        |FROM orders GROUP BY 1 ORDER BY bin""".stripMargin,

    // equi-depth histogram: quantile_cont boundaries verified
    // bit-identical to Spark `percentile` at all three sfs, so the
    // strict `v > boundary` bucket comparison agrees everywhere
    "q_equidepth" ->
      """WITH b AS (SELECT quantile_cont(o_totalprice,
        |                  [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875]) AS bs
        |           FROM orders),
        |a AS (SELECT o_totalprice AS v,
        |             CAST(len(list_filter(b.bs, x -> v > x)) + 1 AS BIGINT) AS bucket
        |      FROM orders, b)
        |SELECT bucket, COUNT(*) AS n_orders, ROUND(MIN(v), 2) AS min_price,
        |       ROUND(MAX(v), 2) AS max_price
        |FROM a GROUP BY bucket ORDER BY bucket""".stripMargin,

    // portable table fingerprint: DuckDB recomputes the identical
    // polynomial row-hash in plain BIGINT arithmetic and the identical
    // XOR/sum folds. c_acctbal can be NEGATIVE and DuckDB `%` keeps
    // the sign where Spark `pmod` is non-negative, so the one signed
    // term gets the ((x % P) + P) % P wrap
    "q_checksum" ->
      """WITH h AS (
        |  SELECT 'customer' AS tbl,
        |         (((c_custkey % 1000000007) * 31 + (c_nationkey % 1000000007))
        |            % 1000000007 * 31
        |          + ((CAST(FLOOR(c_acctbal * 100) AS BIGINT) % 1000000007)
        |             + 1000000007) % 1000000007)
        |           % 1000000007 AS h
        |  FROM customer
        |  UNION ALL
        |  SELECT 'lineitem',
        |         (((((l_orderkey % 1000000007) * 31 + (l_partkey % 1000000007))
        |              % 1000000007 * 31 + (l_suppkey % 1000000007))
        |             % 1000000007 * 31 + (l_linenumber % 1000000007))
        |            % 1000000007 * 31
        |          + (CAST(FLOOR(l_extendedprice * 100) AS BIGINT) % 1000000007))
        |           % 1000000007
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'orders',
        |         (((o_orderkey % 1000000007) * 31 + (o_custkey % 1000000007))
        |            % 1000000007 * 31
        |          + (CAST(FLOOR(o_totalprice * 100) AS BIGINT) % 1000000007))
        |           % 1000000007
        |  FROM orders
        |  UNION ALL
        |  SELECT 'part',
        |         ((p_partkey % 1000000007) * 31 + (p_size % 1000000007))
        |           % 1000000007
        |  FROM part)
        |SELECT tbl, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |       CAST(bit_xor(h) AS BIGINT) AS xor_sig,
        |       CAST(SUM(h) AS BIGINT) AS sum_sig
        |FROM h GROUP BY tbl ORDER BY tbl""".stripMargin,

    // single-scan column profile: per-column UNION ALL is the
    // SQL-expressible twin of the one-aggregate Expand plan
    "q_profile" ->
      """WITH p AS (
        |  SELECT 'o_custkey' AS "column", COUNT(*) AS n_rows,
        |         COUNT(*) - COUNT(o_custkey) AS n_null,
        |         COUNT(DISTINCT o_custkey) AS n_distinct FROM orders
        |  UNION ALL
        |  SELECT 'o_orderdate', COUNT(*), COUNT(*) - COUNT(o_orderdate),
        |         COUNT(DISTINCT o_orderdate) FROM orders
        |  UNION ALL
        |  SELECT 'o_orderkey', COUNT(*), COUNT(*) - COUNT(o_orderkey),
        |         COUNT(DISTINCT o_orderkey) FROM orders
        |  UNION ALL
        |  SELECT 'o_orderpriority', COUNT(*), COUNT(*) - COUNT(o_orderpriority),
        |         COUNT(DISTINCT o_orderpriority) FROM orders
        |  UNION ALL
        |  SELECT 'o_orderstatus', COUNT(*), COUNT(*) - COUNT(o_orderstatus),
        |         COUNT(DISTINCT o_orderstatus) FROM orders
        |  UNION ALL
        |  SELECT 'o_totalprice', COUNT(*), COUNT(*) - COUNT(o_totalprice),
        |         COUNT(DISTINCT o_totalprice) FROM orders)
        |SELECT "column", CAST(n_rows AS BIGINT) AS n_rows,
        |       CAST(n_null AS BIGINT) AS n_null,
        |       CAST(n_distinct AS BIGINT) AS n_distinct
        |FROM p ORDER BY "column"""".stripMargin,

    // the correlated form `o_totalprice > (SELECT AVG ... same cust)`;
    // the oracle uses the decorrelated CTE join (row-set-identical to
    // the Spark side's single-scan window form)
    "q_above_avg" ->
      """WITH a AS (SELECT o_custkey AS a_custkey, AVG(o_totalprice) AS avg_price
        |           FROM orders GROUP BY o_custkey)
        |SELECT o_custkey, COUNT(*) AS n_above,
        |       ROUND(MAX(o_totalprice), 2) AS max_price
        |FROM orders JOIN a ON o_custkey = a_custkey
        |WHERE o_totalprice > avg_price
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "q_window_ntile" ->
      """SELECT c_custkey,
        |       CAST(ntile(4) OVER w AS INT) AS quartile,
        |       ROUND(percent_rank() OVER w, 4) AS pct_rank,
        |       ROUND(cume_dist() OVER w, 4) AS cume
        |FROM customer WINDOW w AS (ORDER BY c_acctbal DESC, c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q_topk_global" ->
      """SELECT c_custkey, c_name, ROUND(SUM(o_totalprice), 2) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey, c_name ORDER BY revenue DESC, c_custkey LIMIT 10""".stripMargin,

    "q_sort_multicol" ->
      """SELECT l_returnflag, l_extendedprice, l_orderkey, l_linenumber FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-06-01' AND l_shipdate < TIMESTAMP '1996-07-01'
        |ORDER BY l_returnflag ASC, l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 200""".stripMargin,

    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                                 ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    // rank/dense_rank over the tied year key alone (tie semantics are
    // the point); row_number's window adds the orderkey tiebreak for
    // a total order
    "q_rank_dense" ->
      """SELECT o_custkey, o_orderkey, CAST(year(o_orderdate) AS INT) AS yr,
        |       CAST(RANK() OVER (PARTITION BY o_custkey
        |                         ORDER BY year(o_orderdate) DESC) AS INT) AS rk,
        |       CAST(DENSE_RANK() OVER (PARTITION BY o_custkey
        |                               ORDER BY year(o_orderdate) DESC) AS INT) AS drk,
        |       CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                               ORDER BY year(o_orderdate) DESC, o_orderkey) AS INT) AS rn
        |FROM orders ORDER BY o_custkey, rn""".stripMargin,

    "q_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |       ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
        |             ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS run_sum
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_window_lag" ->
      """SELECT user_id, event_id,
        |       COALESCE(epoch_us(ts) - LAG(epoch_us(ts), 1) OVER (
        |         PARTITION BY user_id ORDER BY epoch_us(ts), event_id), -1) AS gap_us
        |FROM events ORDER BY user_id, event_id""".stripMargin,

    "q_window_range" ->
      """SELECT user_id, event_id,
        |       COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
        |                      RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW) AS n_10min
        |FROM events ORDER BY user_id, event_id""".stripMargin,

    "q_first_last" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
        |w AS (SELECT user_id,
        |             FIRST_VALUE(event_type) OVER win AS first_type,
        |             LAST_VALUE(event_type) OVER win AS last_type,
        |             NTH_VALUE(event_type, 2) OVER win AS second_type,
        |             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY us, event_id) AS rn
        |      FROM e
        |      WINDOW win AS (PARTITION BY user_id ORDER BY us, event_id
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
        |SELECT user_id, first_type, last_type, COALESCE(second_type, '') AS second_type
        |FROM w WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "q_union" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |UNION
        |SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY c_custkey""".stripMargin,

    "q_intersect" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |INTERSECT
        |SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY c_custkey""".stripMargin,

    "q_except" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |EXCEPT
        |SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY c_custkey""".stripMargin,

    "q_string_funcs" ->
      """SELECT c_custkey, substring(c_name, 10, 9) AS id_suffix,
        |       CAST(length(c_name) AS INT) AS name_len,
        |       lower(c_mktsegment) || '#' || substring(c_name, 10, 9) AS tag,
        |       upper(c_mktsegment) AS seg_upper
        |FROM customer WHERE c_name LIKE 'Customer#00000009%' ORDER BY c_custkey""".stripMargin,

    "q_regex_funcs" ->
      """SELECT c_mktsegment, COUNT(*) AS n_cust,
        |       CAST(SUM(CASE WHEN regexp_matches(c_name, '9[0-9]{2}$') THEN 1 ELSE 0 END) AS BIGINT) AS n_end9,
        |       CAST(SUM(TRY_CAST(regexp_extract(c_name, 'Customer#([0-9]+)', 1) AS BIGINT)) AS BIGINT) AS sum_ids,
        |       MIN(regexp_replace(lower(c_mktsegment), '[aeiou]', '_', 'g')) AS vowelless
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_date_funcs" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        |       CAST(quarter(o_orderdate) AS INT) AS o_quarter,
        |       COUNT(*) AS n_orders,
        |       MIN(CAST(o_orderdate AS DATE)) AS min_date,
        |       MAX(CAST(o_orderdate AS DATE)) AS max_date,
        |       CAST(date_diff('day', MIN(CAST(o_orderdate AS DATE)),
        |                      MAX(CAST(o_orderdate AS DATE))) AS INT) AS span_days
        |FROM orders GROUP BY 1, 2 ORDER BY o_year, o_quarter""".stripMargin,

    "q_math_funcs" ->
      """SELECT p_brand, ROUND(AVG(SQRT(p_retailprice)), 4) AS avg_sqrt,
        |       ROUND(AVG(LN(p_retailprice)), 4) AS avg_ln,
        |       CAST(SUM(p_size % 7) AS BIGINT) AS sum_mod,
        |       ROUND(POWER(CAST(MAX(p_size) AS DOUBLE), 2.0), 1) AS max_pow_sz
        |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q_json_extract" ->
      """SELECT event_type, COUNT(*) AS n_events, ROUND(AVG(k), 3) AS avg_k, MAX(k) AS max_k
        |FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS INT) AS k
        |      FROM events) t
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_array_funcs" ->
      """SELECT doc_id,
        |       CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
        |       CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_distinct,
        |       list_contains(string_split(text, ' '), 'spark') AS has_spark,
        |       array_to_string((list_sort(list_distinct(string_split(text, ' '))))[1:3], ',') AS first3
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_wordcount" ->
      """SELECT word, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS n_docs
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents) t
        |GROUP BY word ORDER BY n DESC, word""".stripMargin,

    "q_text_stats" ->
      """SELECT lang, COUNT(*) AS n_docs, ROUND(AVG(n_chars), 2) AS avg_chars,
        |       COUNT(DISTINCT source) AS n_sources,
        |       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q_tfidf" ->
      """WITH tok AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT lang, term, COUNT(*) AS tot_tf FROM tok GROUP BY lang, term),
        |df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY term),
        |scored AS (SELECT tf.lang, tf.term,
        |                  ROUND(CAST(tf.tot_tf AS DOUBLE) *
        |                        LN((SELECT CAST(COUNT(*) AS DOUBLE) FROM documents) / df.df),
        |                        4) AS score
        |           FROM tf JOIN df ON tf.term = df.term),
        |ranked AS (SELECT lang, term, score,
        |                  CAST(ROW_NUMBER() OVER (PARTITION BY lang
        |                                          ORDER BY score DESC, term) AS INT) AS rn
        |           FROM scored)
        |SELECT lang, term, score, rn FROM ranked WHERE rn <= 5 ORDER BY lang, rn""".stripMargin,

    // token entropy per source: the ln-identity form H = ln(n) −
    // (Σ c·ln c)/n over per-token counts — identical arithmetic on
    // both engines, rounded per rule F
    "q_entropy" ->
      """WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents),
        |c AS (SELECT source, tok, COUNT(*) AS cnt FROM tok GROUP BY source, tok)
        |SELECT source,
        |       CAST(SUM(cnt) AS BIGINT) AS n_tokens,
        |       CAST(COUNT(*) AS BIGINT) AS n_distinct,
        |       ROUND(LN(SUM(cnt)) - SUM(cnt * LN(cnt)) / SUM(cnt), 6) AS entropy
        |FROM c GROUP BY source ORDER BY source""".stripMargin,

    /** Character-level entropy: the q_entropy ln-identity form over
      * the per-source character histogram (string_split on the empty
      * delimiter = one row per char, spaces included — Spark's
      * trailing-empty regex artifact is filtered on its side so the
      * multisets agree). Rounded per rule F. */
    "q_char_entropy" ->
      """WITH ch AS (SELECT source, unnest(string_split(text, '')) AS ch
        |            FROM documents),
        |c AS (SELECT source, ch, COUNT(*) AS cnt FROM ch GROUP BY source, ch)
        |SELECT source,
        |       CAST(SUM(cnt) AS BIGINT) AS n_chars_total,
        |       CAST(COUNT(*) AS BIGINT) AS n_distinct_chars,
        |       ROUND(LN(SUM(cnt)) - SUM(cnt * LN(cnt)) / SUM(cnt), 6) AS entropy
        |FROM c GROUP BY source ORDER BY source""".stripMargin,

    // PMI collocations: rank on the exact rational c12/(ca·cb) (one
    // IEEE division of < 2^53 integers — PMI is monotone in it, M/N
    // are corpus constants), report ln((c12·M²)/(N·ca·cb)) rounded
    // (rule F). Factor order mirrors the Spark left-assoc products.
    "q_collocations" ->
      """WITH d AS (SELECT string_split(text, ' ') AS t FROM documents),
        |u AS (SELECT w, COUNT(*) AS c
        |      FROM (SELECT unnest(t) AS w FROM d) GROUP BY 1),
        |m AS (SELECT CAST(SUM(len(t)) AS BIGINT) AS m FROM d),
        |bgs AS (SELECT unnest(list_transform(generate_series(1, CAST(len(t) AS INT) - 1),
        |               i -> array_to_string(t[i:i+1], ' '))) AS bigram
        |        FROM d WHERE len(t) >= 2),
        |c AS (SELECT string_split(bigram, ' ')[1] AS w1,
        |             string_split(bigram, ' ')[2] AS w2,
        |             COUNT(*) AS n_pair
        |      FROM bgs GROUP BY 1, 2),
        |n AS (SELECT CAST(SUM(len(t) - 1) AS BIGINT) AS n FROM d WHERE len(t) >= 2)
        |SELECT c.w1, c.w2, c.n_pair,
        |       ROUND(LN(CAST(c.n_pair AS DOUBLE) * m.m * m.m
        |                / (CAST(n.n AS DOUBLE) * ua.c * ub.c)), 6) AS pmi
        |FROM c JOIN u ua ON c.w1 = ua.w
        |       JOIN u ub ON c.w2 = ub.w, m, n
        |WHERE c.n_pair >= 5
        |ORDER BY CAST(c.n_pair AS DOUBLE) / CAST(ua.c * ub.c AS DOUBLE) DESC,
        |         c.w1, c.w2
        |LIMIT 50""".stripMargin,

    "q_dedup_exact" ->
      """WITH fps AS (SELECT lang, doc_id,
        |                    array_to_string(list_sort(string_split(text, ' ')), ' ') AS fp
        |             FROM documents),
        |g AS (SELECT lang, fp, MIN(doc_id) AS keeper FROM fps GROUP BY lang, fp)
        |SELECT lang, COUNT(*) AS n_unique, CAST(SUM(keeper) AS BIGINT) AS sum_keeper_ids
        |FROM g GROUP BY lang ORDER BY lang""".stripMargin,

    "q_sim_search" ->
      """WITH probe AS (SELECT embedding AS p FROM embeddings WHERE vec_id = 0),
        |ex AS (SELECT e.vec_id, e.label,
        |              CAST(e.embedding[CAST(t.i AS INT)] AS DOUBLE) *
        |              CAST(probe.p[CAST(t.i AS INT)] AS DOUBLE) AS prod
        |       FROM embeddings e, probe, range(1, 65) t(i) WHERE e.vec_id <> 0)
        |SELECT vec_id, label, ROUND(SUM(prod), 3) AS score FROM ex
        |GROUP BY vec_id, label ORDER BY score DESC, vec_id LIMIT 10""".stripMargin,

    // keep-first span removal: q_span_dedup's span universe with
    // ownership = MIN(doc_id*1e6 + span_idx) per cross-doc-duplicated
    // span; the trailing partial span (n_tok % 16 tokens) always
    // survives. All-integer (rule F/I).
    "q_span_drop" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |idx AS (SELECT doc_id, t,
        |               unnest(generate_series(0, len(t)//16 - 1)) AS i
        |        FROM toks WHERE len(t) >= 16),
        |spans AS (SELECT doc_id, CAST(i AS BIGINT) AS span_idx,
        |                 CAST(len(t) AS BIGINT) AS n_tok,
        |                 array_to_string(t[i*16+1 : i*16+16], ' ') AS span
        |          FROM idx),
        |dup AS (SELECT span, MIN(doc_id * 1000000 + span_idx) AS owner_key
        |        FROM spans GROUP BY span HAVING COUNT(DISTINCT doc_id) >= 2)
        |SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
        |       CAST(SUM(CASE WHEN d.span IS NULL
        |                     OR s.doc_id * 1000000 + s.span_idx = d.owner_key
        |                THEN 1 ELSE 0 END) AS BIGINT) AS kept_spans,
        |       CAST(SUM(CASE WHEN d.span IS NULL
        |                     OR s.doc_id * 1000000 + s.span_idx = d.owner_key
        |                THEN 16 ELSE 0 END) + MAX(s.n_tok) % 16 AS BIGINT) AS tokens_kept
        |FROM spans s LEFT JOIN dup d ON s.span = d.span
        |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin,

    // near-dup provenance matrix: the q_dedup_ngram pair CTEs labeled
    // with each side's source, rolled up per canonical (least,
    // greatest) source pair — lexicographic order agrees cross-engine
    "q_dedup_matrix" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |              WHERE len(string_split(text, ' ')) >= 3),
        |grams AS (SELECT DISTINCT doc_id,
        |                 unnest(list_transform(generate_series(1, CAST(len(t) AS INT) - 2),
        |                        i -> array_to_string(t[i:i+2], ' '))) AS gram
        |          FROM toks),
        |sizes AS (SELECT doc_id, COUNT(*) AS n_grams FROM grams GROUP BY doc_id),
        |common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
        |           FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
        |           GROUP BY 1, 2),
        |pairs AS (SELECT doc_a, doc_b FROM common
        |          JOIN sizes sa ON doc_a = sa.doc_id
        |          JOIN sizes sb ON doc_b = sb.doc_id
        |          WHERE common * 9 >= 4 * (sa.n_grams + sb.n_grams)),
        |lab AS (SELECT da.source AS sa, db.source AS sb
        |        FROM pairs p JOIN documents da ON p.doc_a = da.doc_id
        |                     JOIN documents db ON p.doc_b = db.doc_id)
        |SELECT LEAST(sa, sb) AS src_a, GREATEST(sa, sb) AS src_b,
        |       CAST(COUNT(*) AS BIGINT) AS n_pairs
        |FROM lab GROUP BY 1, 2 ORDER BY src_a, src_b""".stripMargin,

    // asymmetric containment near-dup: the q_dedup_ngram gram/size
    // CTEs but thresholding common/min(na,nb) with NO size-ratio
    // prune; doc_a < doc_b canonical pair order, all-integer (// is
    // DuckDB floor-div == Spark floor(/))
    "q_dedup_contain" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |              WHERE len(string_split(text, ' ')) >= 3),
        |grams AS (SELECT DISTINCT doc_id,
        |                 unnest(list_transform(generate_series(1, CAST(len(t) AS INT) - 2),
        |                        i -> array_to_string(t[i:i+2], ' '))) AS gram
        |          FROM toks),
        |sizes AS (SELECT doc_id, COUNT(*) AS ng FROM grams GROUP BY doc_id),
        |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
        |          FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2)
        |SELECT p.doc_a, p.doc_b, sa.ng AS na, sb.ng AS nb, p.common,
        |       p.common * 1000 // LEAST(sa.ng, sb.ng) AS containment_permille
        |FROM pairs p JOIN sizes sa ON p.doc_a = sa.doc_id
        |             JOIN sizes sb ON p.doc_b = sb.doc_id
        |WHERE p.common * 1000 >= 800 * LEAST(sa.ng, sb.ng)
        |ORDER BY doc_a, doc_b""".stripMargin,

    // substring-level dedup: disjoint 16-token spans, duplicated iff
    // the exact span text occurs in >= 2 distinct docs; dup_permille
    // is integer floor-div (rule F — no floats anywhere). DuckDB list
    // slicing t[a:b] is 1-based inclusive == Spark slice(t, a, 16).
    "q_span_dedup" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |idx AS (SELECT doc_id, t,
        |               unnest(generate_series(0, len(t)//16 - 1)) AS i
        |        FROM toks WHERE len(t) >= 16),
        |spans AS (SELECT doc_id,
        |                 array_to_string(t[i*16+1 : i*16+16], ' ') AS span
        |          FROM idx),
        |dup AS (SELECT span FROM spans
        |        GROUP BY span HAVING COUNT(DISTINCT doc_id) >= 2)
        |SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
        |       CAST(COUNT(d.span) AS BIGINT) AS dup_spans,
        |       CAST(COUNT(d.span) * 1000 // COUNT(*) AS BIGINT) AS dup_permille
        |FROM spans s LEFT JOIN dup d ON s.span = d.span
        |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin,

    // the SLIDING-stride variant: spans start every 4 tokens while a
    // full 16-token window fits (i in 0..(len-16)//4) — the identical
    // overlapping cut the facade's stride=4 produces; same dup rule
    // and integer floor-div permille
    "q_span_dedup_sliding" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |idx AS (SELECT doc_id, t,
        |               unnest(generate_series(0, (len(t)-16)//4)) AS i
        |        FROM toks WHERE len(t) >= 16),
        |spans AS (SELECT doc_id,
        |                 array_to_string(t[i*4+1 : i*4+16], ' ') AS span
        |          FROM idx),
        |dup AS (SELECT span FROM spans
        |        GROUP BY span HAVING COUNT(DISTINCT doc_id) >= 2)
        |SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
        |       CAST(COUNT(d.span) AS BIGINT) AS dup_spans,
        |       CAST(COUNT(d.span) * 1000 // COUNT(*) AS BIGINT) AS dup_permille
        |FROM spans s LEFT JOIN dup d ON s.span = d.span
        |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin,

    // incremental batch-vs-corpus span accounting: corpus = even ids'
    // DISTINCT spans (the standing index), batch = odd ids; per batch
    // doc the share of spans already in the corpus — blind to the
    // Scala side's hash keys and index shape
    "q_span_incremental" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |idx AS (SELECT doc_id, t,
        |               unnest(generate_series(0, len(t)//16 - 1)) AS i
        |        FROM toks WHERE len(t) >= 16),
        |spans AS (SELECT doc_id,
        |                 array_to_string(t[i*16+1 : i*16+16], ' ') AS span
        |          FROM idx),
        |corpus AS (SELECT DISTINCT span FROM spans WHERE doc_id % 2 = 0),
        |b AS (SELECT doc_id, span FROM spans WHERE doc_id % 2 = 1)
        |SELECT b.doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
        |       CAST(COUNT(c.span) AS BIGINT) AS dup_spans,
        |       CAST(COUNT(c.span) * 1000 // COUNT(*) AS BIGINT) AS dup_permille
        |FROM b LEFT JOIN corpus c ON b.span = c.span
        |GROUP BY b.doc_id ORDER BY b.doc_id""".stripMargin,

    // per-dim embedding QC: the q_knn_centroid widen-to-DOUBLE unnest,
    // rolled up per dimension. ROUND(.,4) margins measured: min
    // distance of any mean/std/min/max from a round-4 boundary is
    // ~1e-7 in value terms vs ~1e-13 cross-engine aggregation noise.
    // `+ 0` after ROUND: canonicalizes IEEE −0.0 (which DuckDB prints
    // "-0" but Spark prints "0") — hit live at sf0.1 on two near-zero
    // dimension means (rule F addendum)
    "q_embed_stats" ->
      """WITH ex AS (SELECT vec_id, CAST(t.i AS INT) AS dim,
        |                   CAST(embedding[CAST(t.i AS INT)] AS DOUBLE) AS v
        |            FROM embeddings, range(1, 65) t(i))
        |SELECT dim, CAST(COUNT(*) AS BIGINT) AS n,
        |       ROUND(AVG(v), 4) + 0 AS mean_v,
        |       ROUND(STDDEV_POP(v), 4) + 0 AS std_v,
        |       ROUND(MIN(v), 4) + 0 AS min_v, ROUND(MAX(v), 4) + 0 AS max_v
        |FROM ex GROUP BY dim ORDER BY dim""".stripMargin,

    "q_knn_centroid" ->
      """WITH ex AS (SELECT label, CAST(t.i AS INT) AS pos,
        |                   CAST(embedding[CAST(t.i AS INT)] AS DOUBLE) AS v
        |            FROM embeddings, range(1, 65) t(i)),
        |c AS (SELECT label, pos, AVG(v) AS ctr, COUNT(*) AS n FROM ex GROUP BY label, pos)
        |SELECT label, MAX(n) AS n_vecs, ROUND(SQRT(SUM(ctr * ctr)), 3) AS centroid_norm
        |FROM c GROUP BY label ORDER BY label""".stripMargin,

    "q_tumbling_window" ->
      """SELECT epoch_us(ts) // 3600000000 AS hour_bucket, event_type,
        |       COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour_bucket, event_type""".stripMargin,

    "q_sliding_window" ->
      """SELECT (epoch_us(ts) // 900000000 - t.k) * 900000000 AS win_start, event_type,
        |       COUNT(*) AS n
        |FROM events, range(0, 4) t(k)
        |GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin,

    "q_session_window" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
        |f AS (SELECT user_id, us, event_id,
        |             CASE WHEN LAG(us, 1) OVER w IS NULL THEN 1
        |                  WHEN us - LAG(us, 1) OVER w > 1800000000 THEN 1
        |                  ELSE 0 END AS new_s
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |g AS (SELECT user_id, us,
        |             SUM(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
        |                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |      FROM f),
        |s AS (SELECT user_id, session_id, (MAX(us) - MIN(us)) / 1000000.0 AS len_sec
        |      FROM g GROUP BY user_id, session_id)
        |SELECT user_id, COUNT(*) AS n_sessions, ROUND(AVG(len_sec), 2) AS avg_len_sec
        |FROM s GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_dedup_ngram" ->
      s"""WITH $ngramCtes
        |SELECT doc_a, doc_b, jaccard FROM scored
        |ORDER BY doc_a, doc_b""".stripMargin,

    /** Cross-split leakage: the shared pair-graph CTEs + the
      * q_sample_det integer split hash, rolled up by unordered split
      * pair — blind to the Spark side's cached parquet pair graph.
      * (split_a, split_b) unique (rule O); rule I cast. */
    "q_split_leakage" ->
      s"""WITH $ngramCtes,
        |sp AS (SELECT doc_id,
        |              CASE WHEN ((doc_id % 1000000007) * 2654435761) % 1000 < 800 THEN 'train'
        |                   WHEN ((doc_id % 1000000007) * 2654435761) % 1000 < 900 THEN 'valid'
        |                   ELSE 'test' END AS split
        |       FROM documents)
        |SELECT LEAST(a.split, b.split) AS split_a,
        |       GREATEST(a.split, b.split) AS split_b,
        |       CAST(COUNT(*) AS BIGINT) AS n_pairs
        |FROM scored JOIN sp a ON scored.doc_a = a.doc_id
        |            JOIN sp b ON scored.doc_b = b.doc_id
        |GROUP BY 1, 2 ORDER BY split_a, split_b""".stripMargin,

    /** Semantic split leakage: the q_dedup_semantic tf-idf pair CTEs
      * (kept WITH their rounded cosine) + the same integer split
      * hash, rolled up by unordered split pair with the integer mean
      * cosine — blind to the Spark side's chunked broadcast kernel.
      * ROUND(c·1000, 0) of a rounded-3 double is exactly integral on
      * both engines; sum // count is the rule-F/I mean. */
    "q_split_leakage_semantic" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM t),
        |dfs AS (SELECT u.t AS tok, COUNT(DISTINCT doc_id) AS df
        |        FROM t, unnest(list_distinct(toks)) u(t) GROUP BY 1),
        |voc AS (SELECT tok, ln(n.n / df) AS idf FROM dfs, n
        |        ORDER BY df DESC, tok LIMIT 64),
        |w AS (SELECT t.doc_id, v.tok,
        |             CAST(len(list_filter(t.toks, x -> x = v.tok)) AS DOUBLE)
        |               * v.idf AS w
        |      FROM t, voc v),
        |nr AS (SELECT doc_id, sqrt(SUM(w*w)) AS nn FROM w GROUP BY 1),
        |wn AS (SELECT w.doc_id, w.tok,
        |              CASE WHEN nr.nn > 0 THEN w.w / nr.nn ELSE w.w END AS w
        |       FROM w JOIN nr USING (doc_id) WHERE w.w <> 0),
        |p AS (SELECT a.doc_id AS a, b.doc_id AS b, ROUND(SUM(a.w * b.w), 3) AS c
        |      FROM wn a JOIN wn b ON a.tok = b.tok AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2 HAVING ROUND(SUM(a.w * b.w), 3) >= 0.9),
        |sp AS (SELECT doc_id,
        |              CASE WHEN ((doc_id % 1000000007) * 2654435761) % 1000 < 800 THEN 'train'
        |                   WHEN ((doc_id % 1000000007) * 2654435761) % 1000 < 900 THEN 'valid'
        |                   ELSE 'test' END AS split
        |       FROM documents)
        |SELECT LEAST(sa.split, sb.split) AS split_a,
        |       GREATEST(sa.split, sb.split) AS split_b,
        |       CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |       CAST(SUM(CAST(ROUND(p.c * 1000, 0) AS BIGINT)) // COUNT(*) AS BIGINT)
        |         AS mean_cos_permille
        |FROM p JOIN sp sa ON p.a = sa.doc_id JOIN sp sb ON p.b = sb.doc_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // prefix-filtered exact Jaccard at t = 0.7: the oracle is the
    // BRUTE-FORCE pair graph — deliberately blind to the prefix
    // pruning, so parity proves the filter loses nothing. The
    // integer threshold c·(1000+700) ≥ 700·(na+nb) reduces to
    // c·17 ≥ 7·(na+nb)
    "q_jaccard_prefix" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |              WHERE len(string_split(text, ' ')) >= 3),
        |grams AS (SELECT DISTINCT doc_id,
        |                 unnest(list_transform(generate_series(1, CAST(len(t) AS INT) - 2),
        |                        i -> array_to_string(t[i:i+2], ' '))) AS gram
        |          FROM toks),
        |sizes AS (SELECT doc_id, COUNT(*) AS n_grams FROM grams GROUP BY doc_id),
        |common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
        |           FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
        |           GROUP BY 1, 2),
        |scored AS (SELECT doc_a, doc_b,
        |                  ROUND(common * 1.0 / (sa.n_grams + sb.n_grams - common), 3) AS jaccard
        |           FROM common JOIN sizes sa ON doc_a = sa.doc_id
        |                       JOIN sizes sb ON doc_b = sb.doc_id
        |           WHERE common * 17 >= 7 * (sa.n_grams + sb.n_grams))
        |SELECT doc_a, doc_b, jaccard FROM scored
        |ORDER BY doc_a, doc_b""".stripMargin,

    // the df-capped variant: grams in more than 5 documents leave the
    // gram universe, sizes/Jaccard recomputed over the remainder —
    // the same lossy cap the Spark side applies (maxGramDocFreq = 5)
    "q_dedup_ngram_capped" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |              WHERE len(string_split(text, ' ')) >= 3),
        |grams0 AS (SELECT DISTINCT doc_id,
        |                 unnest(list_transform(generate_series(1, CAST(len(t) AS INT) - 2),
        |                        i -> array_to_string(t[i:i+2], ' '))) AS gram
        |           FROM toks),
        |stop AS (SELECT gram FROM grams0 GROUP BY gram HAVING COUNT(*) > 5),
        |grams AS (SELECT * FROM grams0 WHERE gram NOT IN (SELECT gram FROM stop)),
        |sizes AS (SELECT doc_id, COUNT(*) AS n_grams FROM grams GROUP BY doc_id),
        |common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
        |           FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
        |           GROUP BY 1, 2),
        |scored AS (SELECT doc_a, doc_b,
        |                  ROUND(common * 1.0 / (sa.n_grams + sb.n_grams - common), 3) AS jaccard
        |           FROM common JOIN sizes sa ON doc_a = sa.doc_id
        |                       JOIN sizes sb ON doc_b = sb.doc_id
        |           WHERE common * 9 >= 4 * (sa.n_grams + sb.n_grams))
        |SELECT doc_a, doc_b, jaccard FROM scored
        |ORDER BY doc_a, doc_b""".stripMargin,

    // canonical-string edit distance, blocked by (lang, first canon
    // token, distinct-token count) — the same blocking the Spark
    // facade declares, so parity is exact
    "q_dedup_fuzzy" ->
      """WITH d AS (SELECT doc_id, lang,
        |                  array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ') AS s
        |           FROM documents),
        |d2 AS (SELECT doc_id, lang, s, split_part(s, ' ', 1) AS tok0,
        |              len(string_split(s, ' ')) AS n
        |       FROM d WHERE length(s) > 0)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       levenshtein(a.s, b.s) AS edit_dist
        |FROM d2 a JOIN d2 b
        |  ON a.lang = b.lang AND a.tok0 = b.tok0 AND a.n = b.n
        | AND a.doc_id < b.doc_id
        |WHERE levenshtein(a.s, b.s) <= 8
        |ORDER BY doc_a, doc_b""".stripMargin,

    // sorted-neighborhood pairs: the ROW_NUMBER total order states
    // what the Spark side's two-pass distributed rank computes; the
    // window join is rank-adjacency, the verify is exact set Jaccard
    "q_dedup_sorted" ->
      """WITH d AS (SELECT doc_id, n_chars,
        |                  list_distinct(string_split(text, ' ')) AS ts
        |           FROM documents),
        |r AS (SELECT doc_id, ts,
        |             ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS rn
        |      FROM d),
        |c AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |             len(list_intersect(a.ts, b.ts)) AS i,
        |             len(a.ts) + len(b.ts) - len(list_intersect(a.ts, b.ts)) AS u
        |      FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + 7)
        |SELECT doc_a, doc_b, ROUND(i * 1.0 / u, 3) AS jaccard
        |FROM c WHERE i * 1000 >= u * 900
        |ORDER BY doc_a, doc_b""".stripMargin,

    // Zipf fit: ROW_NUMBER over (cnt DESC, tok) ≡ the Spark side's
    // two-pass distributed rank; regr_slope/regr_r2 share the
    // covar_pop/var_pop closed form across engines
    "q_zipf_slope" ->
      """WITH t AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        |c AS (SELECT tok, COUNT(*) AS cnt FROM t GROUP BY tok),
        |r AS (SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, tok) AS rank FROM c)
        |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS n_types,
        |       (SELECT CAST(SUM(cnt) AS BIGINT) FROM c) AS n_tokens,
        |       ROUND(regr_slope(LN(CAST(cnt AS DOUBLE)), LN(CAST(rank AS DOUBLE))), 4) AS slope,
        |       ROUND(regr_r2(LN(CAST(cnt AS DOUBLE)), LN(CAST(rank AS DOUBLE))), 4) AS r2
        |FROM r ORDER BY n_types""".stripMargin,

    // incremental dedup: the bipartite (even-corpus × odd-batch)
    // restriction of the ngram pair query — same gram universe, same
    // size prefilter (common*9 >= 4*(sa+sb) ⟺ jaccard >= 0.8)
    "q_dedup_incremental" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |              WHERE len(string_split(text, ' ')) >= 3),
        |grams AS (SELECT DISTINCT doc_id,
        |                 unnest(list_transform(generate_series(1, CAST(len(t) AS INT) - 2),
        |                        i -> array_to_string(t[i:i+2], ' '))) AS gram
        |          FROM toks),
        |sizes AS (SELECT doc_id, COUNT(*) AS n_grams FROM grams GROUP BY doc_id),
        |common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
        |           FROM grams a JOIN grams b ON a.gram = b.gram
        |           WHERE a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
        |           GROUP BY 1, 2),
        |scored AS (SELECT doc_a, doc_b,
        |                  ROUND(common * 1.0 / (sa.n_grams + sb.n_grams - common), 3) AS jaccard
        |           FROM common JOIN sizes sa ON doc_a = sa.doc_id
        |                       JOIN sizes sb ON doc_b = sb.doc_id
        |           WHERE common * 9 >= 4 * (sa.n_grams + sb.n_grams))
        |SELECT doc_a, doc_b, jaccard FROM scored ORDER BY doc_a, doc_b""".stripMargin,

    // exact heavy hitters: the sketch inside the Spark facade only
    // finds candidates; the declared output is the exact SQL below
    "q_heavy_hitters" ->
      """WITH t AS (SELECT unnest(string_split(text, ' ')) AS item FROM documents),
        |c AS (SELECT item, COUNT(*) AS cnt FROM t GROUP BY item),
        |n AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM c)
        |SELECT item, cnt FROM c, n WHERE cnt * 31 > n
        |ORDER BY item""".stripMargin,

    // connected components over the same pair graph (min-label ==
    // component minimum), via DuckDB's recursive CTE
    "q_dedup_cluster" ->
      s"""WITH RECURSIVE $ngramCtes,
        |edges AS (SELECT doc_a AS a, doc_b AS b FROM scored
        |          UNION ALL SELECT doc_b, doc_a FROM scored),
        |reach(node, lab) AS (
        |  SELECT a, a FROM (SELECT DISTINCT a FROM edges) t
        |  UNION
        |  SELECT e.b, r.lab FROM reach r JOIN edges e ON e.a = r.node
        |),
        |cc AS (SELECT node, MIN(lab) AS cluster_rep FROM reach GROUP BY node)
        |SELECT cluster_rep, COUNT(*) AS size, CAST(SUM(node) AS BIGINT) AS member_id_sum
        |FROM cc GROUP BY cluster_rep ORDER BY cluster_rep""".stripMargin,

    // the dedup funnel: exact-fingerprint distinct + the recursive-CTE
    // CC over the ngram pair graph, folded to ONE row (no sort key
    // needed); all counts BIGINT (rule I)
    "q_dedup_funnel" ->
      s"""WITH RECURSIVE $ngramCtes,
        |edges AS (SELECT doc_a AS a, doc_b AS b FROM scored
        |          UNION ALL SELECT doc_b, doc_a FROM scored),
        |reach(node, lab) AS (
        |  SELECT a, a FROM (SELECT DISTINCT a FROM edges) t
        |  UNION
        |  SELECT e.b, r.lab FROM reach r JOIN edges e ON e.a = r.node
        |),
        |cc AS (SELECT node, MIN(lab) AS label FROM reach GROUP BY node),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |e AS (SELECT COUNT(*) AS exact_unique FROM
        |        (SELECT DISTINCT lang,
        |                array_to_string(list_sort(string_split(text, ' ')), ' ')
        |         FROM documents)),
        |c AS (SELECT COUNT(DISTINCT label) AS ngram_clusters,
        |             COUNT(*) AS clustered_docs,
        |             CAST(COALESCE(SUM(CASE WHEN node <> label THEN 1 ELSE 0 END), 0) AS BIGINT) AS dropped
        |      FROM cc)
        |SELECT n.n_docs, e.exact_unique,
        |       n.n_docs - e.exact_unique AS exact_dup_docs,
        |       c.ngram_clusters, c.clustered_docs, c.dropped,
        |       n.n_docs - c.dropped AS survivors
        |FROM n, e, c""".stripMargin,

    "q_text_quality" ->
      """WITH q AS (SELECT doc_id, n_chars,
        |                  len(string_split(text, ' ')) AS n,
        |                  len(list_filter(string_split(text, ' '),
        |                                  t -> t = 'the' OR t = 'a')) AS stops
        |           FROM documents)
        |SELECT doc_id, CAST(n AS INT) AS n_tokens,
        |       (n_chars - (n - 1)) * 100 // n AS avg_len_centi,
        |       stops * 1000 // n AS stop_permille,
        |       LEAST(n, 50) * (n - stops) * 1000 // (50 * n) AS quality_permille
        |FROM q ORDER BY doc_id""".stripMargin,

    "q_lang_id" ->
      """WITH tok AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token FROM documents),
        |counts AS (SELECT lang, token, COUNT(*) AS cnt FROM tok GROUP BY 1, 2),
        |profiles AS (SELECT lang AS profile_lang, token FROM (
        |    SELECT lang, token,
        |           ROW_NUMBER() OVER (PARTITION BY lang ORDER BY cnt DESC, token) AS rk
        |    FROM counts) t WHERE rk <= 10),
        |dtok AS (SELECT DISTINCT doc_id, token FROM tok),
        |overlap AS (SELECT d.doc_id, p.profile_lang, COUNT(*) AS overlap
        |            FROM dtok d JOIN profiles p ON d.token = p.token GROUP BY 1, 2),
        |pred AS (SELECT doc_id, profile_lang AS pred_lang FROM (
        |    SELECT doc_id, profile_lang,
        |           ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY overlap DESC, profile_lang) AS rk
        |    FROM overlap) t WHERE rk = 1)
        |SELECT d.lang, p.pred_lang, COUNT(*) AS n_docs
        |FROM documents d LEFT JOIN pred p ON d.doc_id = p.doc_id
        |GROUP BY 1, 2 ORDER BY lang, pred_lang""".stripMargin,

    "q_pipeline_e2e" ->
      """WITH keepers AS (
        |  SELECT MIN(doc_id) AS doc_id
        |  FROM (SELECT lang, doc_id,
        |               array_to_string(list_sort(string_split(text, ' ')), ' ') AS fp
        |        FROM documents) t
        |  GROUP BY lang, fp),
        |gated AS (
        |  SELECT d.lang, d.n_chars,
        |         list_sum(list_transform(string_split(d.text, ' '),
        |                                 x -> (length(x) + 1) // 2)) AS sw,
        |         LEAST(len(string_split(d.text, ' ')), 50) *
        |           (len(string_split(d.text, ' ')) -
        |            len(list_filter(string_split(d.text, ' '), t -> t = 'the' OR t = 'a'))) *
        |           1000 // (50 * len(string_split(d.text, ' '))) AS q
        |  FROM documents d JOIN keepers k ON d.doc_id = k.doc_id)
        |SELECT lang, COUNT(*) AS n_kept,
        |       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |       CAST(SUM(sw) AS BIGINT) AS budget_subwords
        |FROM gated WHERE q >= 400
        |GROUP BY lang ORDER BY lang""".stripMargin,

    "q_token_count" ->
      """SELECT source,
        |       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS ws_tokens,
        |       CAST(SUM(len(regexp_split_to_array(text, '[^a-z0-9]+'))) AS BIGINT) AS re_tokens,
        |       CAST(SUM(list_sum(list_transform(string_split(text, ' '),
        |                                        x -> (length(x) + 1) // 2))) AS BIGINT) AS subword_tokens,
        |       COUNT(DISTINCT text) AS n_distinct_docs
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    "q_dedup_embed" ->
      """WITH e AS (SELECT vec_id, embedding FROM embeddings),
        |p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |             ROUND((SELECT SUM(CAST(x.u AS DOUBLE) * CAST(x.v AS DOUBLE))
        |                    FROM (SELECT unnest(a.embedding) u, unnest(b.embedding) v) x),
        |                   3) AS cosine
        |      FROM e a JOIN e b ON a.vec_id < b.vec_id)
        |SELECT vec_a, vec_b, cosine FROM p ORDER BY cosine DESC, vec_a, vec_b
        |LIMIT 20""".stripMargin,

    // sparse tf-idf cosine pairs: tf-idf recomputed from scratch in
    // SQL (vocab = top-64 df, ties by token; idf = ln(N/df); L2
    // normalize; zero weights dropped — they add exactly 0.0 to any
    // dot), then the same ROUND-3 + id tie-break ranking contract as
    // q_dedup_embed
    "q_sim_sparse" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM t),
        |dfs AS (SELECT u.t AS tok, COUNT(DISTINCT doc_id) AS df
        |        FROM t, unnest(list_distinct(toks)) u(t) GROUP BY 1),
        |voc AS (SELECT tok, ln(n.n / df) AS idf FROM dfs, n
        |        ORDER BY df DESC, tok LIMIT 64),
        |w AS (SELECT t.doc_id, v.tok,
        |             CAST(len(list_filter(t.toks, x -> x = v.tok)) AS DOUBLE)
        |               * v.idf AS w
        |      FROM t, voc v),
        |nr AS (SELECT doc_id, sqrt(SUM(w*w)) AS nn FROM w GROUP BY 1),
        |wn AS (SELECT w.doc_id, w.tok,
        |              CASE WHEN nr.nn > 0 THEN w.w / nr.nn ELSE w.w END AS w
        |       FROM w JOIN nr USING (doc_id) WHERE w.w <> 0),
        |p AS (SELECT a.doc_id AS vec_a, b.doc_id AS vec_b,
        |             ROUND(SUM(a.w * b.w), 3) AS cosine
        |      FROM wn a JOIN wn b ON a.tok = b.tok AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2)
        |SELECT vec_a, vec_b, cosine FROM p
        |ORDER BY cosine DESC, vec_a, vec_b LIMIT 20""".stripMargin,

    "q_range_join" ->
      """WITH ev AS (SELECT event_id, event_type, epoch_us(ts) AS us FROM events),
        |p AS (SELECT event_id, us, us // 10000000 AS bucket FROM ev WHERE event_type = 'purchase'),
        |cb AS (SELECT us // 10000000 + d.o AS bucket, us AS cus
        |       FROM ev, (VALUES (-1), (0), (1)) d(o) WHERE event_type = 'click')
        |SELECT p.event_id,
        |       COALESCE(CAST(SUM(CASE WHEN abs(p.us - cb.cus) <= 10000000 THEN 1 ELSE 0 END) AS BIGINT), 0) AS n_nearby_clicks
        |FROM p LEFT JOIN cb ON p.bucket = cb.bucket
        |GROUP BY p.event_id ORDER BY event_id""".stripMargin,

    "q_repetition" ->
      """WITH g AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |           WHERE len(string_split(text, ' ')) >= 3),
        |x AS (SELECT doc_id, t,
        |             list_transform(generate_series(1, CAST(len(t) AS INT) - 1),
        |                            i -> array_to_string(t[i:i+1], ' ')) AS g2,
        |             list_transform(generate_series(1, CAST(len(t) AS INT) - 2),
        |                            i -> array_to_string(t[i:i+2], ' ')) AS g3
        |      FROM g)
        |SELECT doc_id,
        |       (len(t) - len(list_distinct(t))) * 1000 // len(t) AS dup_tok_permille,
        |       (len(g2) - len(list_distinct(g2))) * 1000 // len(g2) AS dup_g2_permille,
        |       (len(g3) - len(list_distinct(g3))) * 1000 // len(g3) AS dup_g3_permille
        |FROM x ORDER BY doc_id""".stripMargin,

    "q_mixture_sample" ->
      """WITH m AS (SELECT source, n_chars,
        |                  (TRY_CAST(regexp_extract(source, '([0-9]+)$', 1) AS BIGINT) % 4 + 1) * 50
        |                    AS keep_permille,
        |                  ((doc_id % 1000000007) * 2654435761) % 1000 AS h
        |           FROM documents)
        |SELECT source, keep_permille,
        |       COUNT(*) AS n_docs,
        |       CAST(SUM(CASE WHEN h < keep_permille THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |       CAST(SUM(CASE WHEN h < keep_permille THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars
        |FROM m GROUP BY source, keep_permille ORDER BY source""".stripMargin,

    "q_contamination" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |              WHERE len(string_split(text, ' ')) >= 3),
        |grams AS (SELECT DISTINCT doc_id,
        |                 unnest(list_transform(generate_series(1, CAST(len(t) AS INT) - 2),
        |                        i -> array_to_string(t[i:i+2], ' '))) AS gram
        |          FROM toks),
        |ev AS (SELECT doc_id AS eval_id, gram FROM grams WHERE doc_id < 10),
        |evsz AS (SELECT eval_id, COUNT(*) AS n_eval FROM ev GROUP BY eval_id),
        |common AS (SELECT c.doc_id, e.eval_id, COUNT(*) AS common
        |           FROM grams c JOIN ev e ON c.gram = e.gram
        |           WHERE c.doc_id >= 10 GROUP BY 1, 2)
        |SELECT s.eval_id, COUNT(*) AS n_contaminated,
        |       CAST(MAX(common) AS BIGINT) AS max_overlap
        |FROM common c JOIN evsz s ON c.eval_id = s.eval_id
        |WHERE common * 2 >= n_eval
        |GROUP BY s.eval_id ORDER BY s.eval_id""".stripMargin,

    /** Span-level decontamination: the oracle cuts the SAME disjoint
      * 16-token spans from text (list-slice arithmetic — blind to the
      * Scala side's 128-bit hash keys and broadcast shape), dedups
      * the eval side per eval doc, and left-joins so clean eval docs
      * report explicit zeros. Rule I casts; eval_id unique (rule O). */
    "q_span_contamination" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |              WHERE len(string_split(text, ' ')) >= 16),
        |spans AS (SELECT doc_id,
        |          unnest(list_transform(generate_series(0, CAST(len(t) AS INT) // 16 - 1),
        |                 i -> array_to_string(t[(i*16+1):(i*16+16)], ' '))) AS span
        |          FROM toks),
        |ev AS (SELECT DISTINCT doc_id AS eval_id, span FROM spans WHERE doc_id < 10),
        |evsz AS (SELECT eval_id, CAST(COUNT(*) AS BIGINT) AS n_eval_spans
        |         FROM ev GROUP BY eval_id),
        |hits AS (SELECT e.eval_id,
        |                CAST(COUNT(DISTINCT c.doc_id) AS BIGINT) AS n_contaminated,
        |                CAST(COUNT(*) AS BIGINT) AS hit_spans
        |         FROM spans c JOIN ev e ON c.span = e.span
        |         WHERE c.doc_id >= 10 GROUP BY e.eval_id)
        |SELECT s.eval_id, s.n_eval_spans,
        |       CAST(COALESCE(h.n_contaminated, 0) AS BIGINT) AS n_contaminated,
        |       CAST(COALESCE(h.hit_spans, 0) AS BIGINT) AS hit_spans
        |FROM evsz s LEFT JOIN hits h ON s.eval_id = h.eval_id
        |ORDER BY s.eval_id""".stripMargin,

    /** Stitch pairs: suffix-of-a = prefix-of-b on the 4-token
      * boundary, stated as a plain list-slice string join — blind to
      * the Scala side's 128-bit hash keys. (doc_a, doc_b) is a unique
      * sort key (rule O: at most one boundary per ordered pair). */
    "q_stitch_pairs" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |              WHERE len(string_split(text, ' ')) >= 4),
        |sp AS (SELECT doc_id, array_to_string(t[-4:], ' ') AS suf,
        |              array_to_string(t[1:4], ' ') AS pre FROM toks)
        |SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, x.suf AS boundary
        |FROM sp x JOIN sp y ON x.suf = y.pre AND x.doc_id <> y.doc_id
        |ORDER BY doc_a, doc_b""".stripMargin,

    /** Stitch repair: the stitch pair graph (same list-slice join as
      * q_stitch_pairs, blind to hashing) chained into reassembled
      * documents via the recursive-CTE connected components (the
      * q_dedup_cluster recipe), with per-chain repair accounting —
      * stitched_tokens drops one copy of the 4-token boundary per
      * spanning-tree WELD (n_fragments − 1, not per pair —
      * dense/cyclic pair sets carry more pairs than welds).
      * chain_rep unique (rule O); rule I casts. */
    "q_stitch_repair" ->
      """WITH RECURSIVE toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |              WHERE len(string_split(text, ' ')) >= 4),
        |sp AS (SELECT doc_id, array_to_string(t[-4:], ' ') AS suf,
        |              array_to_string(t[1:4], ' ') AS pre FROM toks),
        |pr AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
        |       FROM sp x JOIN sp y ON x.suf = y.pre AND x.doc_id <> y.doc_id),
        |edges AS (SELECT doc_a AS a, doc_b AS b FROM pr
        |          UNION ALL SELECT doc_b, doc_a FROM pr),
        |reach(node, lab) AS (
        |  SELECT a, a FROM (SELECT DISTINCT a FROM edges) t
        |  UNION
        |  SELECT e.b, r.lab FROM reach r JOIN edges e ON e.a = r.node
        |),
        |cc AS (SELECT node, MIN(lab) AS label FROM reach GROUP BY node),
        |tk AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
        |       FROM documents),
        |m AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_fragments,
        |             CAST(SUM(n_toks) AS BIGINT) AS total_tokens
        |      FROM cc JOIN tk ON node = doc_id GROUP BY label),
        |np AS (SELECT c.label, CAST(COUNT(*) AS BIGINT) AS n_pairs
        |       FROM pr JOIN cc c ON pr.doc_a = c.node GROUP BY c.label)
        |SELECT m.label AS chain_rep, m.n_fragments, np.n_pairs, m.total_tokens,
        |       m.total_tokens - (m.n_fragments - 1) * 4 AS stitched_tokens
        |FROM m JOIN np ON m.label = np.label ORDER BY chain_rep""".stripMargin,

    /** PII scan: the same deterministic synthesis (append email /
      * 555-phone / dotted-quad IP by doc_id residue — pure integer
      * string algebra) and the same RE2-compatible patterns, with
      * counts via regexp_extract_all and redacted_chars via the
      * 3-stage global replace in the SAME fixed order. Rule I casts;
      * doc_id unique (rule O). */
    "q_pii_scan" ->
      """WITH t2 AS (SELECT doc_id, text
        |    || CASE WHEN doc_id % 5 = 0
        |            THEN ' user' || CAST(doc_id AS VARCHAR) || '@example.com'
        |            ELSE '' END
        |    || CASE WHEN doc_id % 7 = 0
        |            THEN ' 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |            ELSE '' END
        |    || CASE WHEN doc_id % 11 = 0
        |            THEN ' 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.'
        |                 || CAST((doc_id // 256) % 256 AS VARCHAR)
        |            ELSE '' END AS txt
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(txt, '[a-z0-9._]+@[a-z0-9.-]+\.[a-z]+')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(txt, '555-[0-9]{4}')) AS BIGINT) AS n_phones,
        |  CAST(len(regexp_extract_all(txt, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS BIGINT) AS n_ips,
        |  CAST(length(txt) - length(
        |    regexp_replace(regexp_replace(regexp_replace(txt,
        |      '[a-z0-9._]+@[a-z0-9.-]+\.[a-z]+', '', 'g'),
        |      '555-[0-9]{4}', '', 'g'),
        |      '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '', 'g')) AS BIGINT)
        |    AS redacted_chars
        |FROM t2 ORDER BY doc_id""".stripMargin,

    /** HTML extraction: the same deterministic shell synthesis, then
      * the same four passes in the same stated order — block-element
      * drops (head/nav/footer/script/style, non-greedy, (?s)), tag
      * strip to a space, literal entity unescape lt → gt → amp,
      * whitespace collapse + trim. RE2 ≡ Java regex on every pattern
      * here (the piiSignals stance). Rule I casts. */
    "q_html_extract" ->
      """WITH h AS (SELECT source, doc_id, text,
        |  '<html><head><title>d' || CAST(doc_id AS VARCHAR)
        |  || '</title><style>body{margin:0}</style></head><body><nav>home | docs | sec'
        |  || CAST(doc_id % 10 AS VARCHAR) || '</nav><p>' || text
        |  || CASE WHEN doc_id % 3 = 0 THEN ' Tom &amp; Jerry &lt;3' ELSE '' END
        |  || '</p><footer>(c) 20' || lpad(CAST(doc_id % 25 AS VARCHAR), 2, '0')
        |  || ' corp</footer></body></html>' AS html
        |  FROM documents),
        |e AS (SELECT source, html,
        |  text || CASE WHEN doc_id % 3 = 0 THEN ' Tom & Jerry <3' ELSE '' END
        |    AS want,
        |  trim(regexp_replace(
        |    replace(replace(replace(
        |      regexp_replace(
        |        regexp_replace(
        |        regexp_replace(
        |        regexp_replace(
        |        regexp_replace(
        |        regexp_replace(html,
        |          '(?s)<head(?:\s[^>]*)?>.*?</head>', ' ', 'g'),
        |          '(?s)<nav(?:\s[^>]*)?>.*?</nav>', ' ', 'g'),
        |          '(?s)<footer(?:\s[^>]*)?>.*?</footer>', ' ', 'g'),
        |          '(?s)<script(?:\s[^>]*)?>.*?</script>', ' ', 'g'),
        |          '(?s)<style(?:\s[^>]*)?>.*?</style>', ' ', 'g'),
        |        '<[^>]*>', ' ', 'g'),
        |      '&lt;', '<'), '&gt;', '>'), '&amp;', '&'),
        |    '\s+', ' ', 'g')) AS got
        |  FROM h)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(length(html)) AS BIGINT) AS html_chars,
        |  CAST(SUM(length(got)) AS BIGINT) AS text_chars,
        |  CAST(SUM(CASE WHEN got = want THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_roundtrip,
        |  CAST(SUM(length(html)) - SUM(length(got)) AS BIGINT) * 1000
        |    // CAST(SUM(length(html)) AS BIGINT) AS boiler_permille
        |FROM e GROUP BY source ORDER BY source""".stripMargin,

    /** Outlink accounting: the same hash/link synthesis (j-th link →
      * domain (did + 31j) mod 97, j ≤ doc_id mod 3), the same
      * capture-group extraction, one unnest + rollup. Rule I casts. */
    "q_html_links" ->
      """WITH d0 AS (SELECT source, doc_id,
        |                   doc_id % 1000000007 * 2654435761 % 97 AS did,
        |                   text
        |            FROM documents),
        |h AS (SELECT source, doc_id,
        |  'site' || CAST(did AS VARCHAR)
        |    || CASE WHEN did % 3 = 0 THEN '.com'
        |            WHEN did % 3 = 1 THEN '.org' ELSE '.net' END AS own,
        |  '<p>' || text || '</p>'
        |  || '<a href="https://site' || CAST(did AS VARCHAR)
        |     || CASE WHEN did % 3 = 0 THEN '.com'
        |             WHEN did % 3 = 1 THEN '.org' ELSE '.net' END
        |     || '/doc/' || CAST(doc_id % 1000000007 * 13 + 0 AS VARCHAR)
        |     || '">l0</a>'
        |  || CASE WHEN doc_id % 3 >= 1
        |     THEN '<a href="https://site' || CAST((did + 31) % 97 AS VARCHAR)
        |          || CASE WHEN (did + 31) % 97 % 3 = 0 THEN '.com'
        |                  WHEN (did + 31) % 97 % 3 = 1 THEN '.org'
        |                  ELSE '.net' END
        |          || '/doc/' || CAST(doc_id % 1000000007 * 13 + 1 AS VARCHAR)
        |          || '">l1</a>' ELSE '' END
        |  || CASE WHEN doc_id % 3 >= 2
        |     THEN '<a href="https://site' || CAST((did + 62) % 97 AS VARCHAR)
        |          || CASE WHEN (did + 62) % 97 % 3 = 0 THEN '.com'
        |                  WHEN (did + 62) % 97 % 3 = 1 THEN '.org'
        |                  ELSE '.net' END
        |          || '/doc/' || CAST(doc_id % 1000000007 * 13 + 2 AS VARCHAR)
        |          || '">l2</a>' ELSE '' END AS html
        |  FROM d0),
        |l AS (SELECT source, doc_id, own,
        |             unnest(regexp_extract_all(html, 'href="([^"]+)"', 1))
        |               AS url
        |      FROM h),
        |t AS (SELECT source, doc_id, own,
        |             regexp_extract(url, 'https://([^/]+)/', 1) AS target
        |      FROM l)
        |SELECT source, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |       CAST(COUNT(*) AS BIGINT) AS n_links,
        |       CAST(SUM(CASE WHEN target = own THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_internal,
        |       CAST(SUM(CASE WHEN target <> own THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_external,
        |       CAST(COUNT(DISTINCT target) AS BIGINT) AS n_target_domains,
        |       CAST(SUM(CASE WHEN target <> own THEN 1 ELSE 0 END) AS BIGINT)
        |         * 1000 // CAST(COUNT(*) AS BIGINT) AS external_permille
        |FROM t GROUP BY source ORDER BY source""".stripMargin,

    /** URL canonicalization: the same synthesis and the same five
      * passes — prefix case-fold, https-gated :443 prefix-test drop,
      * the three separator-anchored utm passes, and the
      * split-at-first-`?` trailing-slash collapse — no capture-group
      * replacement anywhere (Java $1 vs RE2 \1 is the one spelling
      * the RE2-compatible stance cannot bridge), `\z` not `$` for
      * end-of-string (round-15 ADVICE: Java `$` also matches before
      * a final newline; `\z` is absolute end in both engines). */
    "q_url_canon" ->
      s"""WITH d0 AS (SELECT source, doc_id,
        |                   doc_id % 1000000007 * 2654435761 % 97 AS did
        |            FROM documents),
        |u AS (SELECT source, doc_id,
        |  'https://site' || CAST(did AS VARCHAR)
        |    || CASE WHEN did % 3 = 0 THEN '.com'
        |            WHEN did % 3 = 1 THEN '.org' ELSE '.net' END AS host,
        |  did FROM d0),
        |m AS (SELECT source, doc_id, host,
        |  CASE WHEN doc_id % 3 = 0 THEN upper(host) ELSE host END
        |  || CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END
        |  || '/doc/' || CAST(doc_id % 1000000007 AS VARCHAR)
        |  || CASE WHEN doc_id % 7 = 0 THEN '/' ELSE '' END
        |  || CASE WHEN doc_id % 2 = 0 AND doc_id % 11 = 0
        |          THEN '?utm_source=feed&utm_campaign=x&ref=kept'
        |          WHEN doc_id % 2 = 0
        |          THEN '?utm_source=feed&utm_campaign=x'
        |          WHEN doc_id % 11 = 0 THEN '?ref=kept' ELSE '' END AS url,
        |  host || '/doc/' || CAST(doc_id % 1000000007 AS VARCHAR)
        |  || CASE WHEN doc_id % 11 = 0 THEN '?ref=kept' ELSE '' END AS want
        |  FROM u),
        |${urlCanonCtes("source, want")}
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(CASE WHEN url <> canon THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_changed,
        |       CAST(SUM(CASE WHEN canon = want THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_roundtrip,
        |       CAST(SUM(length(url) - length(canon)) AS BIGINT)
        |         AS chars_saved,
        |       CAST(SUM(CASE WHEN url <> canon THEN 1 ELSE 0 END) AS BIGINT)
        |         * 1000 // CAST(COUNT(*) AS BIGINT) AS changed_permille
        |FROM c4 GROUP BY source ORDER BY source""".stripMargin,

    /** URL dedup: the page-key synthesis (host/path from pk so group
      * members share the canonical form; casing/port/slash/utm from
      * each doc_id — only removable variation), canonicalized through
      * the SAME shared urlCanonCtes chain as q_url_canon, then
      * keep-min-doc_id per canonical key re-derived in SQL. Rule I
      * casts. */
    "q_dedup_url" ->
      s"""WITH m AS (SELECT source, doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN upper(host) ELSE host END
        |  || CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END
        |  || '/page/' || CAST(pk AS VARCHAR)
        |  || CASE WHEN doc_id % 7 = 0 THEN '/' ELSE '' END
        |  || CASE WHEN doc_id % 2 = 0
        |          THEN '?utm_source=feed&utm_campaign=x' ELSE '' END AS url
        |  FROM (SELECT source, doc_id, pk,
        |          'https://site' || CAST(did AS VARCHAR)
        |          || CASE WHEN did % 3 = 0 THEN '.com'
        |                  WHEN did % 3 = 1 THEN '.org' ELSE '.net' END AS host
        |        FROM (SELECT source, doc_id, doc_id % 127 AS pk,
        |                     doc_id % 127 * 2654435761 % 97 AS did
        |              FROM documents))),
        |${urlCanonCtes("source, doc_id")},
        |g AS (SELECT canon, MIN(doc_id) AS keep_id FROM c4 GROUP BY canon),
        |k AS (SELECT c.source,
        |             CASE WHEN c.doc_id = g.keep_id THEN 1 ELSE 0 END AS kept
        |      FROM c4 c JOIN g USING (canon))
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(kept) AS BIGINT) AS n_kept,
        |       CAST(SUM(1 - kept) AS BIGINT) AS n_dropped,
        |       CAST(SUM(1 - kept) AS BIGINT) * 1000 // CAST(COUNT(*) AS BIGINT)
        |         AS drop_permille
        |FROM k GROUP BY source ORDER BY source""".stripMargin,

    /** Encoding-damage audit: the same three deterministic damage
      * injections and the same three stated-order repair passes —
      * DuckDB regexes get the identical character classes (chr()
      * builds the non-ASCII/control chars so no literal byte can be
      * mangled in transit). Rule I casts. */
    "q_encoding_audit" ->
      """WITH inj AS (SELECT source, text
        |    || CASE WHEN doc_id % 4 = 0
        |            THEN ' caf' || chr(195) || chr(169) ELSE '' END
        |    || CASE WHEN doc_id % 6 = 0
        |            THEN ' bad' || chr(65533) ELSE '' END
        |    || CASE WHEN doc_id % 9 = 0
        |            THEN ' x' || chr(7) || 'y' ELSE '' END AS t
        |  FROM documents),
        |sig AS (SELECT source, t,
        |  CAST(len(regexp_extract_all(t,
        |    '[' || chr(194) || chr(195) || '][' || chr(128) || '-'
        |        || chr(191) || ']')) AS BIGINT) AS m,
        |  CAST(len(regexp_extract_all(t, chr(65533))) AS BIGINT) AS r,
        |  CAST(len(regexp_extract_all(t,
        |    '[' || chr(1) || '-' || chr(8) || chr(11) || chr(12)
        |        || chr(14) || '-' || chr(31) || ']')) AS BIGINT) AS c,
        |  CAST(length(t) - length(
        |    regexp_replace(regexp_replace(regexp_replace(t,
        |      '[' || chr(194) || chr(195) || '][' || chr(128) || '-'
        |          || chr(191) || ']', '?', 'g'),
        |      chr(65533), '', 'g'),
        |      '[' || chr(1) || '-' || chr(8) || chr(11) || chr(12)
        |          || chr(14) || '-' || chr(31) || ']', '', 'g'))
        |    AS BIGINT) AS removed
        |  FROM inj)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(CASE WHEN m + r + c > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_damaged,
        |       CAST(SUM(m) AS BIGINT) AS mojibake_hits,
        |       CAST(SUM(r) AS BIGINT) AS replacement_hits,
        |       CAST(SUM(c) AS BIGINT) AS control_hits,
        |       CAST(SUM(removed) AS BIGINT) AS chars_removed,
        |       CAST(SUM(CASE WHEN m + r + c > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |         * 1000 // CAST(COUNT(*) AS BIGINT) AS damaged_permille
        |FROM sig GROUP BY source ORDER BY source""".stripMargin,

    /** Z-order layout planner: the same div/mod Morton interleave,
      * the same two 16-file layouts and min/max file stats, the same
      * probe-overlap test — each layout one GROUP BY, unioned.
      * The k2 cast is guarded by the same digits-shape regexp as the
      * Spark side (round-15 ADVICE: a bare CAST of a non-'srcN'
      * source is NULL in ANSI-off Spark but an ERROR here).
      * Rule I casts; (scheme, file) unique. */
    "q_zorder_layout" ->
      """WITH k AS (SELECT source, n_chars,
        |    LEAST(length(bin(n_chars)), 15) AS k1,
        |    CASE WHEN regexp_matches(substr(source, 4), '^[0-9]+\z')
        |         THEN CAST(substr(source, 4) AS BIGINT) ELSE 0 END AS k2
        |  FROM documents),
        |z AS (SELECT source, n_chars, k1, k2,
        |    ((k1 // 1) % 2) * 2 + ((k1 // 2) % 2) * 8
        |      + ((k1 // 4) % 2) * 32 + ((k1 // 8) % 2) * 128
        |      + ((k2 // 1) % 2) * 1 + ((k2 // 2) % 2) * 4
        |      + ((k2 // 4) % 2) * 16 + ((k2 // 8) % 2) * 64
        |      + ((k2 // 16) % 2) * 256 AS zv
        |  FROM k),
        |zo AS (SELECT 'zorder' AS scheme, zv // 32 AS file,
        |              CAST(COUNT(*) AS BIGINT) AS n_docs,
        |              CAST(MIN(n_chars) AS BIGINT) AS nc_min,
        |              CAST(MAX(n_chars) AS BIGINT) AS nc_max,
        |              MIN(source) AS src_min, MAX(source) AS src_max
        |       FROM z GROUP BY zv // 32),
        |bs AS (SELECT 'bysource' AS scheme, k2 % 16 AS file,
        |              CAST(COUNT(*) AS BIGINT) AS n_docs,
        |              CAST(MIN(n_chars) AS BIGINT) AS nc_min,
        |              CAST(MAX(n_chars) AS BIGINT) AS nc_max,
        |              MIN(source) AS src_min, MAX(source) AS src_max
        |       FROM z GROUP BY k2 % 16),
        |u AS (SELECT * FROM zo UNION ALL SELECT * FROM bs)
        |SELECT scheme, CAST(file AS BIGINT) AS file, n_docs, nc_min, nc_max,
        |       src_min, src_max,
        |       CAST(CASE WHEN nc_max >= 200 AND nc_min <= 400
        |                  AND src_min <= 'src3' AND src_max >= 'src3'
        |                 THEN 1 ELSE 0 END AS BIGINT) AS hit
        |FROM u ORDER BY scheme, file""".stripMargin,

    /** Token-weighted dup inflation: the q_dedup_drop recursive-CTE
      * components re-derived from scratch, then ONE per-source rollup
      * splitting token mass by membership in the dropped set. All
      * integer (rule I: floor `//` ≡ Spark `div`). */
    "q_dup_tokens" ->
      s"""WITH RECURSIVE $ngramCtes,
        |edges AS (SELECT doc_a AS a, doc_b AS b FROM scored
        |          UNION ALL SELECT doc_b, doc_a FROM scored),
        |reach(node, lab) AS (
        |  SELECT a, a FROM (SELECT DISTINCT a FROM edges) t
        |  UNION
        |  SELECT e.b, r.lab FROM reach r JOIN edges e ON e.a = r.node
        |),
        |cc AS (SELECT node, MIN(lab) AS rep FROM reach GROUP BY node),
        |dropped AS (SELECT node FROM cc WHERE node <> rep),
        |agg AS (SELECT source, COUNT(*) AS n_docs,
        |          CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
        |          CAST(SUM(CASE WHEN doc_id IN (SELECT node FROM dropped)
        |                        THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
        |          CAST(SUM(CASE WHEN doc_id IN (SELECT node FROM dropped)
        |                        THEN len(string_split(text, ' '))
        |                        ELSE 0 END) AS BIGINT) AS dup_tokens
        |        FROM documents GROUP BY source)
        |SELECT source, n_docs, total_tokens, n_dup_docs, dup_tokens,
        |       dup_tokens * 1000 // total_tokens AS dup_token_permille
        |FROM agg ORDER BY source""".stripMargin,

    /** BPE merge candidates: per-token character pairs via a
      * list_transform over range(1, len) — DuckDB's twin of Spark's
      * transform(sequence(...)) — counted over every token
      * occurrence. The (n DESC, pair) order is total, so the top-20
      * cut is deterministic (rule O). */
    "q_bpe_pairs" ->
      """WITH tk AS (SELECT unnest(string_split(text, ' ')) AS t FROM documents),
        |p AS (SELECT unnest(list_transform(range(1, length(t)),
        |                    i -> substr(t, CAST(i AS INT), 2))) AS pair
        |      FROM tk WHERE length(t) >= 2)
        |SELECT pair, COUNT(*) AS n FROM p
        |GROUP BY pair ORDER BY n DESC, pair LIMIT 20""".stripMargin,

    /** BPE learn + encode: the full 12-merge training loop restated
      * as chained CTE stages (pair counts from the wrapped-symbol
      * form → `ORDER BY cnt DESC, pat LIMIT 1` → `replace`), then the
      * same replace chain re-encodes every token occurrence — blind
      * to the Scala side's driver loop. Generated by [[bpeSql]]. */
    "q_bpe_encode" -> bpeSql(nMerges = 12, vocabLimit = 4096),
    "q_tokenizer_fertility" ->
      bpeFertilitySql(nMerges = 12, vocabLimit = 4096),

    /** The learned merge table as first-class output (you need it to
      * APPLY the tokenizer anywhere else): the same generated
      * training stages, each stage's chosen merge unwrapped. */
    "q_bpe_vocab" -> bpeVocabSql(nMerges = 12, vocabLimit = 4096),

    /** Unigram-LM tokenizer seed: substring occurrence mass over word
      * types — list_transform over generate_series is DuckDB's twin
      * of Spark's transform(sequence(...)); the CASE guard mirrors
      * the Spark side's filter(l <= length(w)) (an unguarded series
      * would go descending on short words in Spark — rule S notes
      * both engines' substring/length count code points identically
      * on this corpus). Integer mass, (mass DESC, piece) total order
      * (rule O). */
    "q_unigram_seed" ->
      """WITH words AS (
        |  SELECT w, CAST(COUNT(*) AS BIGINT) AS f
        |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  WHERE length(w) > 0 GROUP BY w),
        |pieces AS (
        |  SELECT unnest(flatten(list_transform(generate_series(1, 4),
        |           l -> CASE WHEN l <= length(w)
        |                THEN list_transform(generate_series(1, CAST(length(w) AS INT) - l + 1),
        |                                    i -> substring(w, i, l))
        |                ELSE [] END))) AS piece, f
        |  FROM words)
        |SELECT piece, CAST(SUM(f) AS BIGINT) AS mass FROM pieces
        |GROUP BY piece ORDER BY mass DESC, piece LIMIT 30""".stripMargin,

    /** Semantic dedup: tf-idf recomputed from scratch (the
      * q_sim_sparse CTEs), the pair join kept at rounded cosine ≥
      * 0.9, the q_text_quality integer score, and the dominance
      * verdict (quality DESC, id ASC) folded per endpoint — blind to
      * the Spark side's DotTopKJoinExec threshold kernel, broadcast
      * chunks, and shared tf-idf parquet table. */
    "q_dedup_semantic" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM t),
        |dfs AS (SELECT u.t AS tok, COUNT(DISTINCT doc_id) AS df
        |        FROM t, unnest(list_distinct(toks)) u(t) GROUP BY 1),
        |voc AS (SELECT tok, ln(n.n / df) AS idf FROM dfs, n
        |        ORDER BY df DESC, tok LIMIT 64),
        |w AS (SELECT t.doc_id, v.tok,
        |             CAST(len(list_filter(t.toks, x -> x = v.tok)) AS DOUBLE)
        |               * v.idf AS w
        |      FROM t, voc v),
        |nr AS (SELECT doc_id, sqrt(SUM(w*w)) AS nn FROM w GROUP BY 1),
        |wn AS (SELECT w.doc_id, w.tok,
        |              CASE WHEN nr.nn > 0 THEN w.w / nr.nn ELSE w.w END AS w
        |       FROM w JOIN nr USING (doc_id) WHERE w.w <> 0),
        |p AS (SELECT a.doc_id AS a, b.doc_id AS b
        |      FROM wn a JOIN wn b ON a.tok = b.tok AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2 HAVING ROUND(SUM(a.w * b.w), 3) >= 0.9),
        |q AS (SELECT doc_id,
        |             LEAST(nt, 50) * (nt - stops) * 1000 // (50 * nt) AS q
        |      FROM (SELECT doc_id, len(string_split(text, ' ')) AS nt,
        |                   len(list_filter(string_split(text, ' '),
        |                                   x -> x = 'the' OR x = 'a')) AS stops
        |            FROM documents)),
        |dir AS (SELECT a AS doc_id, b AS nb FROM p
        |        UNION ALL SELECT b AS doc_id, a AS nb FROM p)
        |SELECT d.doc_id, q1.q AS quality,
        |       CAST(COUNT(*) AS BIGINT) AS n_dups,
        |       CAST(MAX(CASE WHEN q2.q > q1.q
        |                       OR (q2.q = q1.q AND d.nb < d.doc_id)
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS dropped
        |FROM dir d JOIN q q1 ON d.doc_id = q1.doc_id
        |           JOIN q q2 ON d.nb = q2.doc_id
        |GROUP BY 1, 2 ORDER BY d.doc_id""".stripMargin,

    /** NFC accounting: the same decomposed injections (chr(769) =
      * U+0301 COMBINING ACUTE, chr(776) = U+0308 COMBINING
      * DIAERESIS — spelled as chr() so no encoding pass can compose
      * the SQL text itself), normalized by DuckDB's independent
      * utf8proc `nfc_normalize` — the hash match pins cross-library
      * NFC agreement. length() counts code points in BOTH engines. */
    "q_unicode_norm" ->
      """WITH t2 AS (SELECT source, text
        |    || CASE WHEN doc_id % 5 = 0 THEN ' cafe' || chr(769) ELSE '' END
        |    || CASE WHEN doc_id % 7 = 0 THEN ' u' || chr(776) || 'ber' ELSE '' END
        |    AS txt
        |  FROM documents)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN nfc_normalize(txt) <> txt THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_denorm,
        |  CAST(SUM(length(txt) - length(nfc_normalize(txt))) AS BIGINT)
        |    AS chars_saved
        |FROM t2 GROUP BY source ORDER BY source""".stripMargin,

    /** Per-source keyness: the same nested-div micro-share fixed
      * point (rule F: evaluation order IS the contract), ROW_NUMBER
      * over the stated (keyness DESC, token) total order. */
    "q_keyness" ->
      """WITH st AS (SELECT source, unnest(string_split(text, ' ')) AS token FROM documents),
        |cnt AS (SELECT source, token, CAST(COUNT(*) AS BIGINT) AS tf FROM st GROUP BY 1, 2),
        |stot AS (SELECT source, CAST(SUM(tf) AS BIGINT) AS src_tot FROM cnt GROUP BY source),
        |ctot AS (SELECT token, CAST(SUM(tf) AS BIGINT) AS ctf FROM cnt GROUP BY token),
        |g AS (SELECT CAST(SUM(tf) AS BIGINT) AS grand FROM cnt),
        |sc AS (SELECT c.source, c.token, c.tf,
        |              (c.tf * 1000000) // s.src_tot AS src_share_micro,
        |              (t.ctf * 1000000) // g.grand AS corp_share_micro
        |       FROM cnt c JOIN stot s USING (source) JOIN ctot t USING (token) CROSS JOIN g),
        |k AS (SELECT source, token, tf,
        |             (src_share_micro * 1000) // corp_share_micro AS keyness_permille
        |      FROM sc WHERE corp_share_micro > 0),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY source
        |                ORDER BY keyness_permille DESC, token) AS rank FROM k)
        |SELECT source, CAST(rank AS BIGINT) AS rank, token, tf, keyness_permille
        |FROM r WHERE rank <= 3 ORDER BY source, rank""".stripMargin,

    /** Conjunctive search: IN-list token filter + per-doc tf count +
      * the same presence bitmask folded by BIT_OR, gated at 7 — one
      * aggregate, blind to the Spark plan. Rule I casts. */
    "q_bool_search" ->
      """WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
        |m AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS tf_total,
        |             BIT_OR(CASE WHEN t = 'hash' THEN 1 WHEN t = 'join' THEN 2
        |                         ELSE 4 END) AS mask
        |      FROM tk WHERE t IN ('hash', 'join', 'merge') GROUP BY doc_id)
        |SELECT d.doc_id, d.source, m.tf_total
        |FROM m JOIN documents d USING (doc_id) WHERE m.mask = 7
        |ORDER BY d.doc_id""".stripMargin,

    /** Incremental gram-df merge: base (mod-10 ≠ 0) and batch
      * (mod-10 = 0) df tables re-derived from scratch, full-outer
      * merged, one accounting row. All integer (rule I). */
    "q_gramdf_merge" ->
      """WITH bd AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |            WHERE doc_id % 10 <> 0 AND len(string_split(text, ' ')) >= 3),
        |bg AS (SELECT DISTINCT doc_id,
        |              unnest(list_transform(generate_series(1, CAST(len(t) AS INT) - 2),
        |                     i -> array_to_string(t[i:i+2], ' '))) AS gram FROM bd),
        |bdf AS (SELECT gram, CAST(COUNT(*) AS BIGINT) AS gdf_base FROM bg GROUP BY gram),
        |nd AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |       WHERE doc_id % 10 = 0 AND len(string_split(text, ' ')) >= 3),
        |ng AS (SELECT DISTINCT doc_id,
        |              unnest(list_transform(generate_series(1, CAST(len(t) AS INT) - 2),
        |                     i -> array_to_string(t[i:i+2], ' '))) AS gram FROM nd),
        |ndf AS (SELECT gram, CAST(COUNT(*) AS BIGINT) AS gdf_batch FROM ng GROUP BY gram),
        |j AS (SELECT gdf_base, gdf_batch FROM bdf FULL OUTER JOIN ndf USING (gram)),
        |agg AS (SELECT
        |  CAST(SUM(CASE WHEN gdf_base IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_base_types,
        |  CAST(SUM(CASE WHEN gdf_batch IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_batch_types,
        |  CAST(SUM(CASE WHEN gdf_base IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_new_types,
        |  CAST(SUM(CASE WHEN gdf_base IS NOT NULL AND gdf_batch IS NOT NULL
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap_types,
        |  CAST(SUM(COALESCE(gdf_base, 0) + COALESCE(gdf_batch, 0)) AS BIGINT) AS merged_mass,
        |  CAST(SUM(CASE WHEN gdf_base IS NULL THEN gdf_batch ELSE 0 END) AS BIGINT) AS new_mass
        |  FROM j)
        |SELECT n_base_types, n_batch_types, n_new_types, n_overlap_types,
        |       merged_mass, new_mass,
        |       CASE WHEN n_batch_types = 0 THEN 0
        |            ELSE n_new_types * 1000 // n_batch_types END AS novel_permille
        |FROM agg""".stripMargin,

    /** Crawl snapshot diff: the same deterministic mod-11/13/7
      * snapshot synthesis, the same full-outer id join — but CHANGED
      * is decided by DIRECT text comparison, blind to the facade's
      * xxhash64 signature (equivalent up to a 2⁻⁶⁴ collision the
      * signature never surfaces). Rule I casts; churn guard stated
      * as the same explicit CASE. */
    "q_snapshot_diff" ->
      """WITH olds AS (SELECT doc_id, source, text,
        |                     CAST(len(string_split(text, ' ')) AS BIGINT) AS w
        |              FROM documents WHERE doc_id % 11 <> 0),
        |news AS (SELECT doc_id, source,
        |                text || CASE WHEN doc_id % 7 = 0
        |                             THEN ' rev2 edit' ELSE '' END AS text
        |         FROM documents WHERE doc_id % 13 <> 0),
        |news2 AS (SELECT doc_id, source, text,
        |                 CAST(len(string_split(text, ' ')) AS BIGINT) AS w
        |          FROM news),
        |j AS (SELECT COALESCE(n.source, o.source) AS source,
        |             CASE WHEN o.doc_id IS NULL THEN 'added'
        |                  WHEN n.doc_id IS NULL THEN 'removed'
        |                  WHEN o.text <> n.text THEN 'changed'
        |                  ELSE 'unchanged' END AS st,
        |             o.w AS wo, n.w AS wn
        |      FROM olds o FULL OUTER JOIN news2 n ON o.doc_id = n.doc_id)
        |SELECT source,
        |  CAST(SUM(CASE WHEN st <> 'added' THEN 1 ELSE 0 END) AS BIGINT) AS n_old,
        |  CAST(SUM(CASE WHEN st <> 'removed' THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
        |  CAST(SUM(CASE WHEN st = 'added' THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
        |  CAST(SUM(CASE WHEN st = 'removed' THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
        |  CAST(SUM(CASE WHEN st = 'changed' THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
        |  CAST(SUM(CASE WHEN st = 'unchanged' THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged,
        |  CAST(SUM(CASE WHEN st = 'added' THEN wn ELSE 0 END) AS BIGINT) AS tokens_added,
        |  CAST(SUM(CASE WHEN st = 'removed' THEN wo ELSE 0 END) AS BIGINT) AS tokens_removed,
        |  CAST(SUM(CASE WHEN st = 'changed' THEN wn - wo ELSE 0 END) AS BIGINT)
        |    AS tokens_changed_delta,
        |  CAST(SUM(CASE WHEN st = 'added' THEN wn
        |                WHEN st = 'removed' THEN -wo
        |                WHEN st = 'changed' THEN wn - wo
        |                ELSE 0 END) AS BIGINT) AS net_token_delta,
        |  CASE WHEN SUM(CASE WHEN st <> 'added' THEN 1 ELSE 0 END) > 0
        |       THEN CAST(SUM(CASE WHEN st IN ('added', 'removed', 'changed')
        |                          THEN 1 ELSE 0 END) AS BIGINT) * 1000
        |            // CAST(SUM(CASE WHEN st <> 'added' THEN 1 ELSE 0 END) AS BIGINT)
        |       ELSE 0 END AS churn_permille
        |FROM j GROUP BY source ORDER BY source""".stripMargin,

    /** Phrase search: the same total-order top-bigram selection
      * (count DESC, bigram ASC, LIMIT 1), then adjacency re-counted
      * ROW-LOCALLY (list_filter over positions) — blind to the Spark
      * side's positional-index join. Zero-hit sources drop via
      * HAVING in this form and via the match-row groupBy on the
      * Spark side — the same set. Rule I casts. */
    "q_phrase_search" ->
      """WITH tk AS (SELECT source, doc_id, string_split(text, ' ') AS t
        |            FROM documents),
        |bg AS (SELECT unnest(list_transform(
        |                generate_series(1, CAST(len(t) AS INT) - 1),
        |                i -> array_to_string(t[i:i+1], ' '))) AS gram
        |       FROM tk WHERE len(t) >= 2),
        |top AS (SELECT gram FROM (SELECT gram, COUNT(*) AS n FROM bg GROUP BY gram)
        |        ORDER BY n DESC, gram LIMIT 1),
        |ph AS (SELECT string_split(gram, ' ')[1] AS w1,
        |              string_split(gram, ' ')[2] AS w2 FROM top),
        |hits AS (SELECT k.source, p.w1, p.w2,
        |                len(list_filter(
        |                  generate_series(1, CAST(len(k.t) AS INT) - 1),
        |                  i -> k.t[i] = p.w1 AND k.t[i+1] = p.w2)) AS h
        |         FROM tk k CROSS JOIN ph p)
        |SELECT source, w1, w2,
        |       CAST(SUM(CASE WHEN h > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs,
        |       CAST(SUM(h) AS BIGINT) AS n_hits
        |FROM hits GROUP BY source, w1, w2
        |HAVING SUM(h) > 0 ORDER BY source""".stripMargin,

    /** Proximity search: the same self-derived probe phrase, the
      * window-4 ordered co-occurrence re-counted ROW-LOCALLY via a
      * nested list_filter over positions — blind to the Spark side's
      * positional-index join (and a superset of the phrase oracle's
      * adjacency count by construction). Rule I casts. */
    "q_proximity_search" ->
      """WITH tk AS (SELECT source, doc_id, string_split(text, ' ') AS t
        |            FROM documents),
        |bg AS (SELECT unnest(list_transform(
        |                generate_series(1, CAST(len(t) AS INT) - 1),
        |                i -> array_to_string(t[i:i+1], ' '))) AS gram
        |       FROM tk WHERE len(t) >= 2),
        |top AS (SELECT gram FROM (SELECT gram, COUNT(*) AS n FROM bg GROUP BY gram)
        |        ORDER BY n DESC, gram LIMIT 1),
        |ph AS (SELECT string_split(gram, ' ')[1] AS w1,
        |              string_split(gram, ' ')[2] AS w2 FROM top),
        |hits AS (SELECT k.source, p.w1, p.w2,
        |                COALESCE(list_sum(list_transform(
        |                  generate_series(1, CAST(len(k.t) AS INT)),
        |                  i -> CASE WHEN k.t[i] = p.w1 THEN
        |                         len(list_filter(
        |                           generate_series(i + 1,
        |                             LEAST(i + 4, CAST(len(k.t) AS INT))),
        |                           j -> k.t[j] = p.w2))
        |                       ELSE 0 END)), 0) AS h
        |         FROM tk k CROSS JOIN ph p)
        |SELECT source, w1, w2,
        |       CAST(SUM(CASE WHEN h > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs,
        |       CAST(SUM(h) AS BIGINT) AS n_hits
        |FROM hits GROUP BY source, w1, w2
        |HAVING SUM(h) > 0 ORDER BY source""".stripMargin,

    /** Readability: the same deterministic sentence-punctuation
      * synthesis (period on every k-th token, k = 5 + doc_id mod 7),
      * then words / sentences / vowel-group syllables re-counted with
      * DuckDB's own regex calls and the identical integer milli-unit
      * Flesch formula — all floor-divs on positive operands, clamp
      * at 0 before any aggregate div (rule I). */
    "q_readability" ->
      """WITH d0 AS (SELECT source, string_split(text, ' ') AS t,
        |                   doc_id % 7 + 5 AS k
        |            FROM documents),
        |p AS (SELECT source,
        |        array_to_string(list_transform(
        |          generate_series(1, CAST(len(t) AS INT)),
        |          i -> t[i] || CASE WHEN i % k = 0 THEN '.' ELSE '' END),
        |          ' ') AS ptext
        |      FROM d0),
        |m AS (SELECT source,
        |        CAST(len(string_split(ptext, ' ')) AS BIGINT) AS w,
        |        GREATEST(CAST(len(regexp_extract_all(ptext, '[.!?]'))
        |                      AS BIGINT), 1) AS sn,
        |        CAST(len(regexp_extract_all(ptext, '[aeiouy]+'))
        |             AS BIGINT) AS sy
        |      FROM p),
        |f AS (SELECT source,
        |        GREATEST(0, 206835 - (1015 * (w * 1000 // sn)) // 1000
        |                           - (846 * (sy * 1000 // w)) // 10)
        |          AS fre_milli
        |      FROM m WHERE w > 0)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(fre_milli) // COUNT(*) AS BIGINT) AS mean_fre_milli,
        |       CAST(MIN(fre_milli) AS BIGINT) AS min_fre_milli,
        |       CAST(MAX(fre_milli) AS BIGINT) AS max_fre_milli,
        |       CAST(SUM(CASE WHEN fre_milli >= 60000 THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_easy,
        |       CAST(SUM(CASE WHEN fre_milli < 30000 THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_hard
        |FROM f GROUP BY source ORDER BY source""".stripMargin,

    /** Code detect: the same deterministic contamination (mod-9
      * replace / light-append), the symbol-class density re-counted
      * with DuckDB's own regexp_extract_all and the identical
      * integer permille gate at 100 (rule I). The snippet length is
      * computed by LENGTH(), never hardcoded, so both engines divide
      * by the same constant. */
    "q_code_detect" ->
      """WITH c0 AS (SELECT source, doc_id, n_chars, text,
        |  'int i = 0; while (i < n) { t += a[i]; i = i + 1; } ' AS snip
        |            FROM documents),
        |c1 AS (SELECT source,
        |         CASE WHEN doc_id % 9 = 0
        |              THEN repeat(snip, GREATEST(1,
        |                     CAST(n_chars // LENGTH(snip) AS INT)))
        |              WHEN doc_id % 9 = 4 THEN text || ' x = 1;'
        |              ELSE text END AS ctext
        |       FROM c0),
        |m AS (SELECT source, CAST(LENGTH(ctext) AS BIGINT) AS nc,
        |             CAST(len(regexp_extract_all(ctext, '[=;(){}\[\]<>+]'))
        |                  AS BIGINT) AS sym
        |      FROM c1),
        |f AS (SELECT source, nc, sym, sym * 1000 // nc AS density
        |      FROM m WHERE nc > 0)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(CASE WHEN density >= 100 THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_code,
        |       CAST(SUM(CASE WHEN density >= 100 THEN 1 ELSE 0 END)
        |            AS BIGINT) * 1000 // CAST(COUNT(*) AS BIGINT)
        |         AS code_permille,
        |       CAST(SUM(CASE WHEN density > 0 AND density < 100
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_light,
        |       CAST(SUM(sym) AS BIGINT) * 1000 // CAST(SUM(nc) AS BIGINT)
        |         AS corpus_density_permille,
        |       CAST(MAX(density) AS BIGINT) AS max_density_permille
        |FROM f GROUP BY source ORDER BY source""".stripMargin,

    /** Anchor text: the q_html_links synthesis with per-linker
      * first-token anchors, elements re-extracted with DuckDB's own
      * regexes, the consensus anchor re-ranked by an explicit
      * ROW_NUMBER under the same (count DESC, anchor ASC) total
      * order — blind to the Spark window. Rule I casts. */
    "q_anchor_text" ->
      """WITH d0 AS (SELECT doc_id, text,
        |                   doc_id % 1000000007 * 2654435761 % 97 AS did,
        |                   string_split(text, ' ')[1] AS w0
        |            FROM documents),
        |h AS (SELECT
        |  '<p>' || text || '</p>'
        |  || '<a href="https://site' || CAST(did AS VARCHAR)
        |     || CASE WHEN did % 3 = 0 THEN '.com'
        |             WHEN did % 3 = 1 THEN '.org' ELSE '.net' END
        |     || '/">' || w0 || '</a>'
        |  || CASE WHEN doc_id % 3 >= 1
        |     THEN '<a href="https://site' || CAST((did + 31) % 97 AS VARCHAR)
        |          || CASE WHEN (did + 31) % 97 % 3 = 0 THEN '.com'
        |                  WHEN (did + 31) % 97 % 3 = 1 THEN '.org'
        |                  ELSE '.net' END
        |          || '/">' || w0 || '</a>' ELSE '' END
        |  || CASE WHEN doc_id % 3 >= 2
        |     THEN '<a href="https://site' || CAST((did + 62) % 97 AS VARCHAR)
        |          || CASE WHEN (did + 62) % 97 % 3 = 0 THEN '.com'
        |                  WHEN (did + 62) % 97 % 3 = 1 THEN '.org'
        |                  ELSE '.net' END
        |          || '/">' || w0 || '</a>' ELSE '' END AS html
        |  FROM d0),
        |el AS (SELECT unnest(regexp_extract_all(html,
        |                '<a href="[^"]*">[^<]*</a>')) AS e FROM h),
        |ta AS (SELECT regexp_extract(e, 'https://([^/]+)/', 1) AS target,
        |              regexp_extract(e, '>([^<]*)<', 1) AS anchor FROM el),
        |cnt AS (SELECT target, anchor, CAST(COUNT(*) AS BIGINT) AS n
        |        FROM ta GROUP BY target, anchor),
        |top AS (SELECT target, anchor AS top_anchor, n AS top_anchor_n,
        |               ROW_NUMBER() OVER (PARTITION BY target
        |                                  ORDER BY n DESC, anchor) AS rk
        |        FROM cnt),
        |roll AS (SELECT target, CAST(SUM(n) AS BIGINT) AS n_inlinks,
        |                CAST(COUNT(DISTINCT anchor) AS BIGINT) AS n_anchors
        |         FROM cnt GROUP BY target)
        |SELECT r.target, r.n_inlinks, r.n_anchors, t.top_anchor,
        |       t.top_anchor_n
        |FROM roll r JOIN top t ON r.target = t.target AND t.rk = 1
        |ORDER BY r.target""".stripMargin,

    /** Crawl frontier: the same did-mod-5 ledger cut and the same
      * three-branch target synthesis (UNION ALL mirrors the Spark
      * side's null-filtered array explode), probed by the identical
      * LEFT JOIN against the DISTINCT ledger dim. Rule I casts. */
    "q_crawl_frontier" ->
      """WITH d0 AS (SELECT source, doc_id,
        |                   doc_id % 1000000007 * 2654435761 % 97 AS did
        |            FROM documents),
        |led AS (SELECT DISTINCT 'site' || CAST(did AS VARCHAR)
        |          || CASE WHEN did % 3 = 0 THEN '.com'
        |                  WHEN did % 3 = 1 THEN '.org' ELSE '.net' END
        |          AS domain
        |        FROM d0 WHERE did % 5 <= 1),
        |tg AS (SELECT source, did % 97 AS t FROM d0
        |       UNION ALL
        |       SELECT source, (did + 31) % 97 FROM d0 WHERE doc_id % 3 >= 1
        |       UNION ALL
        |       SELECT source, (did + 62) % 97 FROM d0 WHERE doc_id % 3 >= 2),
        |tgt AS (SELECT source,
        |          'site' || CAST(t AS VARCHAR)
        |          || CASE WHEN t % 3 = 0 THEN '.com'
        |                  WHEN t % 3 = 1 THEN '.org' ELSE '.net' END
        |          AS target
        |        FROM tg),
        |j AS (SELECT g.source, g.target, l.domain
        |      FROM tgt g LEFT JOIN led l ON g.target = l.domain)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_links,
        |       CAST(COUNT(DISTINCT target) AS BIGINT) AS n_targets,
        |       CAST(SUM(CASE WHEN domain IS NOT NULL THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_covered_links,
        |       CAST(SUM(CASE WHEN domain IS NULL THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_frontier_links,
        |       CAST(COUNT(DISTINCT CASE WHEN domain IS NULL THEN target END)
        |            AS BIGINT) AS n_frontier_domains,
        |       CAST(SUM(CASE WHEN domain IS NULL THEN 1 ELSE 0 END)
        |            AS BIGINT) * 1000 // CAST(COUNT(*) AS BIGINT)
        |         AS frontier_permille
        |FROM j GROUP BY source ORDER BY source""".stripMargin,

    /** Snapshot edit magnitude: the same changed-doc predicate and
      * appended edit, the gram sets re-derived by explode + DISTINCT
      * (blind to the Spark side's array_intersect/array_union), the
      * same union = 0 → 1000 contract via a LEFT JOIN. Rule I casts
      * (the HUGEINT `//` mean is cast at the output). */
    "q_snapshot_churn" ->
      """WITH ch AS (SELECT doc_id, source,
        |                   string_split(text, ' ') AS ot,
        |                   string_split(text || ' rev2 edit', ' ') AS nt
        |            FROM documents
        |            WHERE doc_id % 7 = 0 AND doc_id % 11 <> 0
        |              AND doc_id % 13 <> 0),
        |og AS (SELECT DISTINCT doc_id,
        |              unnest(list_transform(
        |                generate_series(1, CAST(len(ot) AS INT) - 2),
        |                i -> array_to_string(ot[i:i+2], ' '))) AS gram
        |       FROM ch WHERE len(ot) >= 3),
        |ng AS (SELECT DISTINCT doc_id,
        |              unnest(list_transform(
        |                generate_series(1, CAST(len(nt) AS INT) - 2),
        |                i -> array_to_string(nt[i:i+2], ' '))) AS gram
        |       FROM ch WHERE len(nt) >= 3),
        |u AS (SELECT doc_id, gram, MAX(io) AS io, MAX(inn) AS inn
        |      FROM (SELECT doc_id, gram, 1 AS io, 0 AS inn FROM og
        |            UNION ALL
        |            SELECT doc_id, gram, 0, 1 FROM ng)
        |      GROUP BY doc_id, gram),
        |per0 AS (SELECT doc_id, CAST(SUM(io * inn) AS BIGINT) AS inter,
        |                CAST(COUNT(*) AS BIGINT) AS un
        |         FROM u GROUP BY doc_id),
        |per AS (SELECT c.source,
        |               CASE WHEN p.un IS NULL OR p.un = 0 THEN 1000
        |                    ELSE p.inter * 1000 // p.un END AS jacc
        |        FROM ch c LEFT JOIN per0 p ON c.doc_id = p.doc_id)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_changed,
        |       CAST(SUM(jacc) // COUNT(*) AS BIGINT) AS mean_jacc_permille,
        |       CAST(MIN(jacc) AS BIGINT) AS min_jacc_permille,
        |       CAST(MAX(jacc) AS BIGINT) AS max_jacc_permille,
        |       CAST(SUM(CASE WHEN jacc >= 900 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_light,
        |       CAST(SUM(CASE WHEN jacc < 500 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_heavy
        |FROM per GROUP BY source ORDER BY source""".stripMargin,

    /** Dup rate by quality band: the recursive-CTE components + the
      * q_text_quality integer score (both re-derived from scratch —
      * blind to the Spark side's cached labels and struct getField),
      * one ≤ 11-row band rollup. All integer (rule I). */
    "q_dup_quality" ->
      s"""WITH RECURSIVE $ngramCtes,
        |edges AS (SELECT doc_a AS a, doc_b AS b FROM scored
        |          UNION ALL SELECT doc_b, doc_a FROM scored),
        |reach(node, lab) AS (
        |  SELECT a, a FROM (SELECT DISTINCT a FROM edges) t
        |  UNION
        |  SELECT e.b, r.lab FROM reach r JOIN edges e ON e.a = r.node
        |),
        |cc AS (SELECT node, MIN(lab) AS label FROM reach GROUP BY node),
        |dropped AS (SELECT node FROM cc WHERE node <> label),
        |qd AS (SELECT doc_id, len(string_split(text, ' ')) AS n,
        |              len(list_filter(string_split(text, ' '),
        |                              t -> t = 'the' OR t = 'a')) AS stops
        |       FROM documents),
        |qs AS (SELECT doc_id, LEAST(n, 50) * (n - stops) * 1000 // (50 * n) AS q
        |       FROM qd)
        |SELECT q // 100 AS q_band, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(CASE WHEN doc_id IN (SELECT node FROM dropped)
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
        |       CAST(SUM(CASE WHEN doc_id IN (SELECT node FROM dropped)
        |                     THEN 1 ELSE 0 END) * 1000 // COUNT(*) AS BIGINT)
        |         AS dup_permille
        |FROM qs GROUP BY 1 ORDER BY 1""".stripMargin,

    /** Shard-local dedup loss: the shared pair-graph CTEs + the
      * q_sample_det multiplicative hash mod 16, co-shard membership
      * per K via mod-K of the 16-shard id (every K divides 16), one
      * 4-row rollup. All integer (rule I). */
    "q_shard_dedup" ->
      s"""WITH $ngramCtes,
        |p AS (SELECT ((doc_a % 1000000007) * 2654435761) % 16 AS ba,
        |             ((doc_b % 1000000007) * 2654435761) % 16 AS bb
        |      FROM scored),
        |k AS (SELECT unnest([2, 4, 8, 16]) AS n_shards),
        |agg AS (SELECT n_shards, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |               CAST(SUM(CASE WHEN ba % n_shards = bb % n_shards
        |                             THEN 1 ELSE 0 END) AS BIGINT) AS n_local
        |        FROM p CROSS JOIN k GROUP BY n_shards)
        |SELECT n_shards, n_pairs, n_pairs - n_local AS n_cross,
        |       (n_pairs - n_local) * 1000 // n_pairs AS cross_permille
        |FROM agg ORDER BY n_shards""".stripMargin,

    /** Span-level shard-dedup loss: q_span_dedup's duplicated-span
      * universe (exact 16-token span text in ≥ 2 distinct docs — the
      * oracle groups by TEXT, blind to the facade's 128-bit hash
      * keys), the q_sample_det multiplicative hash mod 16, and per K
      * the groups no single K-shard sees twice. Per-shard distinct
      * counts ADD across shard classes (shards partition docs), so
      * everything above the span explode is integer arithmetic over
      * the (span, shard16) table (rule I). */
    "q_span_shard_loss" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |idx AS (SELECT doc_id, t,
        |               unnest(generate_series(0, len(t)//16 - 1)) AS i
        |        FROM toks WHERE len(t) >= 16),
        |spans AS (SELECT doc_id,
        |                 ((doc_id % 1000000007) * 2654435761) % 16 AS b16,
        |                 array_to_string(t[i*16+1 : i*16+16], ' ') AS span
        |          FROM idx),
        |per AS (SELECT span, b16, COUNT(DISTINCT doc_id) AS c
        |        FROM spans GROUP BY span, b16),
        |dup AS (SELECT span FROM per GROUP BY span HAVING SUM(c) >= 2),
        |k AS (SELECT unnest([2, 4, 8, 16]) AS n_shards),
        |lk AS (SELECT n_shards, p.span, p.b16 % n_shards AS bk,
        |              SUM(p.c) AS ck
        |       FROM per p JOIN dup d ON p.span = d.span CROSS JOIN k
        |       GROUP BY n_shards, p.span, bk),
        |mx AS (SELECT n_shards, span, MAX(ck) AS max_local
        |       FROM lk GROUP BY n_shards, span)
        |SELECT n_shards, CAST(COUNT(*) AS BIGINT) AS n_dup_spans,
        |       CAST(SUM(CASE WHEN max_local < 2 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_lost,
        |       CAST(CASE WHEN COUNT(*) = 0 THEN 0
        |                 ELSE SUM(CASE WHEN max_local < 2 THEN 1 ELSE 0 END)
        |                      * 1000 // COUNT(*) END AS BIGINT)
        |         AS lost_permille
        |FROM mx GROUP BY n_shards ORDER BY n_shards""".stripMargin,

    /** Exact tie-corrected Mann–Whitney AUC per lang (one-vs-rest)
      * over the q_text_quality composite score, via the grouped
      * midrank identity: every doc in a score group of size cnt with
      * c_before strictly-smaller docs has doubled midrank
      * 2·c_before + cnt + 1. Blind to the Spark side's decimal
      * accumulation — BIGINT suffices at oracle scale. */
    "q_quality_auc" ->
      """WITH sc AS (SELECT lang,
        |                   LEAST(len(string_split(text, ' ')), 50)
        |                     * (len(string_split(text, ' '))
        |                        - len(list_filter(string_split(text, ' '),
        |                                          t -> t = 'the' OR t = 'a')))
        |                     * 1000
        |                     // (50 * len(string_split(text, ' '))) AS score
        |            FROM documents),
        |by_score AS (SELECT score, COUNT(*) AS cnt FROM sc GROUP BY 1),
        |cum AS (SELECT score, cnt,
        |               COALESCE(SUM(cnt) OVER (ORDER BY score
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |                        0) AS c_before
        |        FROM by_score),
        |by_lang AS (SELECT lang, score, COUNT(*) AS pos FROM sc GROUP BY 1, 2),
        |a AS (SELECT lang, SUM(pos) AS n_pos,
        |             SUM(pos * (2 * c_before + cnt + 1)) AS sum_rank_x2
        |      FROM by_lang JOIN cum USING (score) GROUP BY 1),
        |t AS (SELECT *, SUM(n_pos) OVER () AS n_total FROM a)
        |SELECT lang, CAST(n_pos AS BIGINT) AS n_pos,
        |       CAST(n_total - n_pos AS BIGINT) AS n_neg,
        |       CAST((sum_rank_x2 - n_pos * (n_pos + 1)) * 1000000
        |            // (2 * n_pos * (n_total - n_pos)) AS BIGINT) AS auc_ppm
        |FROM t ORDER BY lang""".stripMargin,

    /** PR curve: the same q_quality_auc integer score, the same
      * decile collapse and reversed prefix sums, the same explicit
      * empty-prediction-set CASE (never a null/throw divergence).
      * Rule I casts; threshold unique (rule O). */
    "q_pr_curve" ->
      """WITH sc AS (SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
        |                   LEAST(len(string_split(text, ' ')), 50)
        |                     * (len(string_split(text, ' '))
        |                        - len(list_filter(string_split(text, ' '),
        |                                          t -> t = 'the' OR t = 'a')))
        |                     * 1000
        |                     // (50 * len(string_split(text, ' '))) AS score
        |            FROM documents),
        |bk AS (SELECT LEAST(score // 100, 9) AS b,
        |              COUNT(*) AS cnt, SUM(y) AS pos
        |       FROM sc GROUP BY 1),
        |w AS (SELECT b,
        |             SUM(pos) OVER (ORDER BY b ROWS BETWEEN CURRENT ROW
        |               AND UNBOUNDED FOLLOWING) AS tp,
        |             SUM(cnt) OVER (ORDER BY b ROWS BETWEEN CURRENT ROW
        |               AND UNBOUNDED FOLLOWING) AS n_pred,
        |             SUM(pos) OVER () AS n_pos
        |      FROM bk)
        |SELECT CAST(b * 100 AS BIGINT) AS threshold,
        |       CAST(n_pred AS BIGINT) AS n_pred, CAST(tp AS BIGINT) AS tp,
        |       CAST(n_pred - tp AS BIGINT) AS fp,
        |       CAST(n_pos - tp AS BIGINT) AS fn,
        |       CAST(CASE WHEN n_pred > 0 THEN tp * 1000 // n_pred
        |                 ELSE 0 END AS BIGINT) AS precision_permille,
        |       CAST(CASE WHEN n_pos > 0 THEN tp * 1000 // n_pos
        |                 ELSE 0 END AS BIGINT) AS recall_permille
        |FROM w ORDER BY threshold""".stripMargin,

    /** Exact water-filling token-budget allocation — mirrors the
      * facade's prefix test (saturated iff cap·W_from ≤ w·(B −
      * C_before) under the quantized-ratio order) with HUGEINT where
      * the Spark side runs decimal(38,0). */
    "q_token_budget" ->
      """WITH per AS (SELECT source AS "group",
        |                    SUM(len(string_split(text, ' '))) AS n_tokens
        |             FROM documents GROUP BY 1
        |             HAVING SUM(len(string_split(text, ' '))) > 0),
        |w AS (SELECT *,
        |             CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE))) AS BIGINT)
        |               AS weight,
        |             n_tokens * 4000 // 1000 AS cap_tokens
        |      FROM per),
        |tot AS (SELECT SUM(n_tokens) AS corpus_tokens FROM w),
        |ord AS (SELECT w.*, corpus_tokens * 2000 // 1000 AS budget,
        |               cap_tokens * 1048576 // weight AS rk
        |        FROM w, tot),
        |tested AS (SELECT *,
        |        COALESCE(SUM(cap_tokens) OVER (ORDER BY rk, "group"
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |          AS c_before,
        |        SUM(weight) OVER (ORDER BY rk, "group"
        |          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS w_from
        |    FROM ord),
        |sat AS (SELECT *,
        |               CASE WHEN CAST(cap_tokens AS HUGEINT) * w_from
        |                         <= CAST(weight AS HUGEINT)
        |                            * (budget - c_before)
        |                    THEN 1 ELSE 0 END AS saturated
        |        FROM tested),
        |res AS (SELECT SUM(CASE WHEN saturated = 1 THEN cap_tokens
        |                        ELSE 0 END) AS sat_caps,
        |               SUM(CASE WHEN saturated = 0 THEN weight
        |                        ELSE 0 END) AS w_unsat
        |        FROM sat),
        |alloc AS (SELECT s."group", s.n_tokens, s.weight, s.cap_tokens,
        |                 CAST(s.saturated AS BIGINT) AS saturated,
        |                 CAST(CASE WHEN s.saturated = 1 THEN s.cap_tokens
        |                      ELSE CAST(s.weight AS HUGEINT)
        |                           * (s.budget - r.sat_caps) // r.w_unsat
        |                      END AS BIGINT) AS alloc_tokens
        |          FROM sat s, res r)
        |SELECT "group", CAST(n_tokens AS BIGINT) AS n_tokens, weight,
        |       CAST(cap_tokens AS BIGINT) AS cap_tokens, saturated,
        |       alloc_tokens,
        |       CAST(alloc_tokens * 1000 // n_tokens AS BIGINT)
        |         AS epochs_milli
        |FROM alloc ORDER BY "group"""".stripMargin,

    /** PSI drift between source pairs on the power-of-two length
      * buckets — the same +1 Laplace smoothing over the pair's
      * union-bucket set and the same round-6 float sum (the
      * q_bigram_entropy stance); ln ≡ Spark's log (natural). */
    "q_psi_drift" ->
      """WITH c AS (SELECT source, length(bin(n_chars)) AS bkt,
        |                  CAST(COUNT(*) AS BIGINT) AS c
        |           FROM documents GROUP BY 1, 2),
        |s AS (SELECT DISTINCT source FROM documents),
        |p AS (SELECT a.source AS src_a, b.source AS src_b
        |      FROM s a JOIN s b ON a.source < b.source),
        |m AS (SELECT p.src_a, p.src_b, c.bkt,
        |        CAST(SUM(CASE WHEN c.source = p.src_a THEN c.c ELSE 0 END)
        |          AS BIGINT) AS ca,
        |        CAST(SUM(CASE WHEN c.source = p.src_b THEN c.c ELSE 0 END)
        |          AS BIGINT) AS cb
        |      FROM p JOIN c ON c.source IN (p.src_a, p.src_b)
        |      GROUP BY 1, 2, 3),
        |t AS (SELECT src_a, src_b, ca, cb,
        |        CAST(SUM(ca) OVER (PARTITION BY src_a, src_b) AS BIGINT) AS n_a,
        |        CAST(SUM(cb) OVER (PARTITION BY src_a, src_b) AS BIGINT) AS n_b,
        |        CAST(COUNT(*) OVER (PARTITION BY src_a, src_b) AS BIGINT) AS nb
        |      FROM m)
        |SELECT src_a, src_b, MAX(n_a) AS n_a, MAX(n_b) AS n_b,
        |       MAX(nb) AS n_buckets,
        |       ROUND(SUM((CAST(ca + 1 AS DOUBLE) / (n_a + nb)
        |                    - CAST(cb + 1 AS DOUBLE) / (n_b + nb))
        |                 * ln((CAST(ca + 1 AS DOUBLE) / (n_a + nb))
        |                      / (CAST(cb + 1 AS DOUBLE) / (n_b + nb)))), 6)
        |         AS psi
        |FROM t GROUP BY src_a, src_b ORDER BY src_a, src_b""".stripMargin,

    /** Two-sample KS between source pairs on the ppm-quantized
      * length ECDFs — the same per-term floor the Spark side takes,
      * so the statistic is engine-exact by construction. */
    "q_ks_drift" ->
      """WITH counts AS (SELECT source, n_chars, COUNT(*) AS c
        |                FROM documents GROUP BY 1, 2),
        |srcs AS (SELECT DISTINCT source FROM counts),
        |pairs AS (SELECT a.source AS src_a, b.source AS src_b
        |          FROM srcs a JOIN srcs b ON a.source < b.source),
        |member AS (SELECT src_a AS source, src_a, src_b FROM pairs
        |           UNION ALL
        |           SELECT src_b AS source, src_a, src_b FROM pairs),
        |merged AS (SELECT src_a, src_b, n_chars,
        |                  SUM(CASE WHEN m.source = src_a THEN c ELSE 0 END) AS ca,
        |                  SUM(CASE WHEN m.source = src_b THEN c ELSE 0 END) AS cb
        |           FROM member m JOIN counts USING (source)
        |           GROUP BY 1, 2, 3),
        |ecdf AS (SELECT src_a, src_b, n_chars,
        |                SUM(ca) OVER w AS cum_a, SUM(cb) OVER w AS cum_b,
        |                SUM(ca) OVER p AS n_a, SUM(cb) OVER p AS n_b
        |         FROM merged
        |         WINDOW w AS (PARTITION BY src_a, src_b ORDER BY n_chars
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |                p AS (PARTITION BY src_a, src_b)),
        |gaps AS (SELECT *,
        |                ABS(cum_a * 1000000 // n_a
        |                    - cum_b * 1000000 // n_b) AS gap
        |         FROM ecdf),
        |mx AS (SELECT *, MAX(gap) OVER (PARTITION BY src_a, src_b) AS ks_ppm
        |       FROM gaps)
        |SELECT src_a, src_b, CAST(MAX(n_a) AS BIGINT) AS n_a,
        |       CAST(MAX(n_b) AS BIGINT) AS n_b,
        |       CAST(MAX(ks_ppm) AS BIGINT) AS ks_ppm,
        |       CAST(MIN(n_chars) AS BIGINT) AS at_n_chars
        |FROM mx WHERE gap = ks_ppm
        |GROUP BY src_a, src_b ORDER BY src_a, src_b""".stripMargin,

    /** Int8 quantization profile: q = SIGN(x) · FLOOR(ABS(x) · 127) —
      * symmetric magnitude quantization (plain floor would count only
      * positive near-zeros in n_zero and bias sum_q by −0.5/element);
      * exact float→double widen + IEEE abs/multiply/floor/sign (no
      * round: banker's-vs-half-up would diverge), then INTEGER
      * aggregates only, so no float summation order exists (rule F). */
    "q_embed_quantize" ->
      """WITH ex AS (SELECT label, CAST(x AS DOUBLE) AS xd,
        |                   CAST(SIGN(CAST(x AS DOUBLE))
        |                        * FLOOR(ABS(CAST(x AS DOUBLE)) * 127) AS BIGINT) AS q
        |            FROM (SELECT label, unnest(embedding) AS x FROM embeddings))
        |SELECT label, CAST(COUNT(*) AS BIGINT) AS n_elems,
        |       CAST(SUM(CASE WHEN ABS(xd) > 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_clip,
        |       CAST(SUM(CASE WHEN q = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
        |       CAST(SUM(q) AS BIGINT) AS sum_q,
        |       CAST(SUM(ABS(q)) AS BIGINT) AS sum_abs_q,
        |       CAST(MAX(ABS(q)) AS BIGINT) AS max_abs_q
        |FROM ex GROUP BY label ORDER BY label""".stripMargin,

    /** Interpolated Kneser–Ney bigram head: the same d = 3/4
      * all-integer fixed point as the Spark facade — both engines
      * evaluate the identical nested-integer-div expression (rule F:
      * the evaluation order IS the contract), so the scores are
      * bit-equal. (c12 DESC, bigram) is a total order (rule O). */
    "q_kn_bigram" ->
      """WITH tok AS (SELECT string_split(text, ' ') AS t FROM documents
        |             WHERE len(string_split(text, ' ')) >= 2),
        |bgs AS (SELECT unnest(list_transform(generate_series(1, CAST(len(t) AS INT) - 1),
        |               i -> array_to_string(t[i:i+1], ' '))) AS bigram FROM tok),
        |bc AS (SELECT bigram, CAST(COUNT(*) AS BIGINT) AS c12 FROM bgs GROUP BY bigram),
        |sp AS (SELECT bigram, c12, string_split(bigram, ' ')[1] AS w1,
        |              string_split(bigram, ' ')[2] AS w2 FROM bc),
        |fol AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
        |               CAST(COUNT(*) AS BIGINT) AS n1p_fol FROM sp GROUP BY w1),
        |pre AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1p_pre FROM sp GROUP BY w2),
        |tt AS (SELECT CAST(COUNT(*) AS BIGINT) AS t_types FROM bc)
        |SELECT bigram, c12,
        |       CAST(((4*c12 - 3) * 1000000) // (4*c1)
        |       + (3 * n1p_fol * ((n1p_pre * 1000000) // t_types)) // (4*c1)
        |         AS BIGINT) AS kn_micro
        |FROM sp JOIN fol USING (w1) JOIN pre USING (w2) CROSS JOIN tt
        |ORDER BY c12 DESC, bigram LIMIT 20""".stripMargin,

    /** Pairwise source vocabulary Jaccard: DISTINCT over the unnested
      * (source, token) pairs, token-equi self-join with src_a < src_b,
      * integer permille (rule I). Zero-overlap pairs appear in
      * NEITHER engine (inner join) — the stated contract. */
    "q_vocab_overlap" ->
      """WITH st AS (SELECT DISTINCT source, unnest(string_split(text, ' ')) AS token
        |            FROM documents),
        |c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_types FROM st GROUP BY source),
        |p AS (SELECT a.source AS src_a, b.source AS src_b, CAST(COUNT(*) AS BIGINT) AS common
        |      FROM st a JOIN st b ON a.token = b.token AND a.source < b.source
        |      GROUP BY 1, 2)
        |SELECT src_a, src_b, ca.n_types AS types_a, cb.n_types AS types_b, common,
        |       common * 1000 // (ca.n_types + cb.n_types - common) AS jaccard_permille
        |FROM p JOIN c ca ON src_a = ca.source JOIN c cb ON src_b = cb.source
        |ORDER BY src_a, src_b""".stripMargin,

    /** Source-interleaved curriculum: the q_shuffle_det integer
      * scramble (seed 20260814) per source, then the round-robin
      * global order — both as plain ROW_NUMBER windows, blind to the
      * Spark side's two-pass distributed rank. doc_id unique
      * (rule O); rule I casts. */
    "q_interleave" ->
      """WITH k AS (SELECT doc_id, source,
        |        ((((doc_id % 1000000007) + 20260814) % 1000000007)
        |         * 2654435761) % 1000000007 AS sk
        |      FROM documents),
        |r AS (SELECT doc_id, source,
        |             ROW_NUMBER() OVER (PARTITION BY source
        |                                ORDER BY sk, doc_id) AS src_pos
        |      FROM k)
        |SELECT doc_id, source, CAST(src_pos AS BIGINT) AS src_pos,
        |       CAST(ROW_NUMBER() OVER (ORDER BY src_pos, source) AS BIGINT)
        |         AS global_pos
        |FROM r ORDER BY doc_id""".stripMargin,

    /** Mixture reweighting: per-source token shares and the τ=½
      * temperature weights — the same integer permille → floored
      * sqrt → integer permille pipeline (sqrt of an integer is
      * IEEE-correctly-rounded in both engines, and its floor is
      * taken before any sum). source unique (rule O); rule I casts. */
    "q_mixture_weights" ->
      """WITH per AS (SELECT source AS "group",
        |        CAST(COUNT(*) AS BIGINT) AS n_docs,
        |        CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |      FROM documents GROUP BY source),
        |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total FROM per),
        |sh AS (SELECT "group", n_docs, n_tokens,
        |              n_tokens * 1000 // total AS share_permille,
        |              CAST(FLOOR(SQRT(CAST(n_tokens * 1000 // total AS DOUBLE))) AS BIGINT) AS isq
        |       FROM per, tot),
        |st AS (SELECT CAST(SUM(isq) AS BIGINT) AS isq_total FROM sh)
        |SELECT "group", n_docs, n_tokens,
        |       CAST(share_permille AS BIGINT) AS share_permille,
        |       isq * 1000 // isq_total AS weight_permille
        |FROM sh, st ORDER BY "group" """.stripMargin,

    /** Domain curation: the same mod-first hash, URL synthesis,
      * 13-residue blocklist and rank-3 cap re-stated in SQL — the
      * window rank mirrors Spark's (domain, doc_id) total order
      * (doc_id unique → deterministic). Rule I casts throughout. */
    "q_domain_caps" ->
      """WITH d0 AS (SELECT doc_id % 1000000007 * 2654435761 % 97 AS did,
        |                   doc_id,
        |                   CAST(len(string_split(text, ' ')) AS BIGINT) AS t
        |            FROM documents),
        |d1 AS (SELECT 'site' || CAST(did AS VARCHAR)
        |              || CASE WHEN did % 3 = 0 THEN '.com'
        |                      WHEN did % 3 = 1 THEN '.org'
        |                      ELSE '.net' END AS domain,
        |              CASE WHEN did % 13 = 0 THEN 1 ELSE 0 END AS blocked,
        |              doc_id, t
        |       FROM d0),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY domain
        |                                   ORDER BY doc_id) AS rk
        |      FROM d1)
        |SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(t) AS BIGINT) AS n_tokens,
        |       CAST(MAX(blocked) AS BIGINT) AS blocked,
        |       CAST(SUM(CASE WHEN blocked = 0 AND rk <= 3 THEN 1 ELSE 0 END)
        |            AS BIGINT) AS kept_docs,
        |       CAST(SUM(CASE WHEN blocked = 0 AND rk <= 3 THEN t ELSE 0 END)
        |            AS BIGINT) AS kept_tokens,
        |       CAST(SUM(t) - SUM(CASE WHEN blocked = 0 AND rk <= 3
        |                              THEN t ELSE 0 END) AS BIGINT) * 1000
        |         // CAST(SUM(t) AS BIGINT) AS drop_token_permille
        |FROM r GROUP BY domain ORDER BY domain""".stripMargin,

    /** Length buckets: the binary-width power-of-two identity
      * 2^len(bin(n−1)) stated with the same string-length arithmetic
      * (no float log2), then the per-bucket padding rollup. bucket
      * unique (rule O); rule I casts. */
    "q_length_buckets" ->
      """WITH t AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n
        |           FROM documents),
        |b AS (SELECT n, CASE WHEN n <= 1 THEN 1
        |                     ELSE 1 << length(bin(n - 1)) END AS bucket
        |      FROM t WHERE n >= 1)
        |SELECT CAST(bucket AS BIGINT) AS bucket,
        |       CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(n) AS BIGINT) AS n_tokens,
        |       CAST(COUNT(*) * bucket AS BIGINT) AS padded_tokens,
        |       CAST((COUNT(*) * bucket - SUM(n)) * 1000 // (COUNT(*) * bucket) AS BIGINT)
        |         AS waste_permille
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,

    /** Quality-gate calibration: the identical q_text_quality score
      * expression, collapsed to a per-(source, score) histogram, then
      * percentile_disc LOWER semantics stated as the same
      * `cum·100 ≥ n·p` integer arithmetic the Spark facade uses (rule
      * F — no engine's float interpolation in sight). Rule I casts
      * everywhere a DuckDB SUM would widen to HUGEINT. */
    "q_quality_gate" ->
      """WITH qd AS (SELECT source, len(string_split(text, ' ')) AS n,
        |                   len(list_filter(string_split(text, ' '),
        |                                   t -> t = 'the' OR t = 'a')) AS stops
        |            FROM documents),
        |qs AS (SELECT source, LEAST(n, 50) * (n - stops) * 1000 // (50 * n) AS q
        |       FROM qd),
        |h AS (SELECT source, q, COUNT(*) AS c FROM qs GROUP BY 1, 2),
        |cum AS (SELECT source, q, c,
        |               SUM(c) OVER (PARTITION BY source ORDER BY q) AS cum,
        |               SUM(c) OVER (PARTITION BY source) AS n
        |        FROM h)
        |SELECT source, CAST(MAX(n) AS BIGINT) AS n_docs,
        |       CAST(MIN(CASE WHEN cum * 100 >= n * 25 THEN q END) AS BIGINT) AS p25,
        |       CAST(MIN(CASE WHEN cum * 100 >= n * 50 THEN q END) AS BIGINT) AS p50,
        |       CAST(MIN(CASE WHEN cum * 100 >= n * 90 THEN q END) AS BIGINT) AS p90,
        |       CAST(SUM(CASE WHEN q < 500 THEN c ELSE 0 END) AS BIGINT) AS n_dropped,
        |       CAST(SUM(CASE WHEN q < 500 THEN c ELSE 0 END) * 1000 // MAX(n) AS BIGINT)
        |         AS drop_permille
        |FROM cum GROUP BY source ORDER BY source""".stripMargin,

    /** Quality-aware cluster representative: the q_dedup_cluster
      * recursive-CTE components joined to the q_text_quality score,
      * argmax per cluster via ROW_NUMBER over the stated total order
      * (quality desc, doc_id asc) — blind to the Spark side's
      * max(struct) aggregate. Rule I casts. */
    "q_dedup_rep_quality" ->
      s"""WITH RECURSIVE $ngramCtes,
        |edges AS (SELECT doc_a AS a, doc_b AS b FROM scored
        |          UNION ALL SELECT doc_b, doc_a FROM scored),
        |reach(node, lab) AS (
        |  SELECT a, a FROM (SELECT DISTINCT a FROM edges) t
        |  UNION
        |  SELECT e.b, r.lab FROM reach r JOIN edges e ON e.a = r.node
        |),
        |cc AS (SELECT node, MIN(lab) AS label FROM reach GROUP BY node),
        |qd AS (SELECT doc_id, len(string_split(text, ' ')) AS n,
        |              len(list_filter(string_split(text, ' '),
        |                              t -> t = 'the' OR t = 'a')) AS stops
        |       FROM documents),
        |qs AS (SELECT doc_id, LEAST(n, 50) * (n - stops) * 1000 // (50 * n) AS q
        |       FROM qd),
        |m AS (SELECT c.label, qs.doc_id, qs.q,
        |             ROW_NUMBER() OVER (PARTITION BY c.label
        |                                ORDER BY qs.q DESC, qs.doc_id) AS rn
        |      FROM cc c JOIN qs ON c.node = qs.doc_id)
        |SELECT label AS cluster_rep,
        |       CAST(COUNT(*) AS BIGINT) AS n_members,
        |       CAST(MAX(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT) AS best_doc,
        |       CAST(MAX(CASE WHEN rn = 1 THEN q END) AS BIGINT) AS best_quality
        |FROM m GROUP BY label ORDER BY cluster_rep""".stripMargin,

    /** Threshold sweep: the ngram pair enumeration at the LOWEST
      * candidate cut 0.7 (c·1700 ≥ 700(a+b) ⇔ 17c ≥ 7(a+b) — the
      * same exact-integer threshold algebra as the 0.8 CTE's
      * 9c ≥ 4(a+b)), then ALL-INTEGER permille banding: jp = c·1000
      * // union, band = jp − jp % 50. No rounded float is banded on
      * either engine (rule F). Rule I casts. */
    "q_dedup_sweep" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |              WHERE len(string_split(text, ' ')) >= 3),
        |grams AS (SELECT DISTINCT doc_id,
        |                 unnest(list_transform(generate_series(1, CAST(len(t) AS INT) - 2),
        |                        i -> array_to_string(t[i:i+2], ' '))) AS gram
        |          FROM toks),
        |sizes AS (SELECT doc_id, COUNT(*) AS n_grams FROM grams GROUP BY doc_id),
        |common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
        |           FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
        |           GROUP BY 1, 2),
        |jp AS (SELECT common * 1000 // (sa.n_grams + sb.n_grams - common) AS jp
        |       FROM common JOIN sizes sa ON doc_a = sa.doc_id
        |                   JOIN sizes sb ON doc_b = sb.doc_id
        |       WHERE common * 17 >= 7 * (sa.n_grams + sb.n_grams))
        |SELECT CAST(jp - jp % 50 AS BIGINT) AS band_lo,
        |       CAST(COUNT(*) AS BIGINT) AS n_pairs
        |FROM jp GROUP BY 1 ORDER BY band_lo""".stripMargin,

    /** Gram df histogram: the same distinct-gram universe as every
      * ngram CTE, document frequency per gram, then the
      * q_length_buckets binary-width bucket identity. Rule I casts
      * (DuckDB SUM widens to HUGEINT). */
    "q_gram_df_hist" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |              WHERE len(string_split(text, ' ')) >= 3),
        |grams AS (SELECT DISTINCT doc_id,
        |                 unnest(list_transform(generate_series(1, CAST(len(t) AS INT) - 2),
        |                        i -> array_to_string(t[i:i+2], ' '))) AS gram
        |          FROM toks),
        |df AS (SELECT gram, COUNT(*) AS gdf FROM grams GROUP BY gram),
        |b AS (SELECT gdf, CASE WHEN gdf <= 1 THEN 1
        |                       ELSE 1 << length(bin(gdf - 1)) END AS bucket
        |      FROM df)
        |SELECT CAST(bucket AS BIGINT) AS df_bucket,
        |       CAST(COUNT(*) AS BIGINT) AS n_grams,
        |       CAST(SUM(gdf) AS BIGINT) AS total_df
        |FROM b GROUP BY bucket ORDER BY df_bucket""".stripMargin,

    /** Vocabulary coverage curve: tokens ranked by (count DESC, token
      * ASC) — the one total order both engines state; per k the
      * covered type count and integer floor-div permille of total
      * token mass. Blind to the Spark side's two-pass distributed
      * rank. Rule I casts; k unique (rule O). */
    "q_vocab_coverage" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        |c AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY tok),
        |r AS (SELECT tok, n, ROW_NUMBER() OVER (ORDER BY n DESC, tok) AS rnk FROM c),
        |ks AS (SELECT CAST(unnest([4, 8, 16, 24, 32]) AS BIGINT) AS k)
        |SELECT ks.k,
        |       CAST(SUM(CASE WHEN r.rnk <= ks.k THEN 1 ELSE 0 END) AS BIGINT) AS top_types,
        |       (CAST(SUM(CASE WHEN r.rnk <= ks.k THEN n ELSE 0 END) AS BIGINT) * 1000)
        |         // CAST(SUM(n) AS BIGINT) AS covered_permille
        |FROM r, ks GROUP BY ks.k ORDER BY ks.k""".stripMargin,

    /** Vocabulary growth: four nested slices by doc_id mod 4; a type
      * exists in slice s iff its MIN bucket < s (the windowless
      * cumulative-distinct trick, stated identically here). Rule I
      * casts; s unique (rule O). */
    "q_vocab_growth" ->
      """WITH d AS (SELECT doc_id % 4 AS b, text FROM documents),
        |tok AS (SELECT b, unnest(string_split(text, ' ')) AS tok FROM d),
        |fb AS (SELECT tok, MIN(b) AS fb FROM tok GROUP BY tok),
        |ks AS (SELECT CAST(unnest([1, 2, 3, 4]) AS BIGINT) AS s),
        |ty AS (SELECT ks.s, CAST(SUM(CASE WHEN fb < ks.s THEN 1 ELSE 0 END) AS BIGINT) AS vocab_types
        |       FROM fb, ks GROUP BY ks.s),
        |tt AS (SELECT ks.s, CAST(SUM(CASE WHEN b < ks.s THEN 1 ELSE 0 END) AS BIGINT) AS total_tokens
        |       FROM tok, ks GROUP BY ks.s),
        |dd AS (SELECT ks.s, CAST(SUM(CASE WHEN b < ks.s THEN 1 ELSE 0 END) AS BIGINT) AS n_docs
        |       FROM d, ks GROUP BY ks.s)
        |SELECT dd.s, dd.n_docs, ty.vocab_types, tt.total_tokens
        |FROM dd JOIN ty ON dd.s = ty.s JOIN tt ON dd.s = tt.s
        |ORDER BY dd.s""".stripMargin,

    /** Bigram conditional entropy: all log arguments are integer
      * counts and the algebraic form mirrors the Spark side
      * factor-for-factor (the q_entropy ROUND-6 parity recipe). */
    "q_bigram_entropy" ->
      """WITH toks AS (SELECT lang, string_split(text, ' ') AS t FROM documents
        |              WHERE len(string_split(text, ' ')) >= 2),
        |bg AS (SELECT lang,
        |              unnest(list_transform(generate_series(1, CAST(len(t) AS INT) - 1),
        |                     i -> array_to_string(t[i:i+1], ' '))) AS g
        |       FROM toks),
        |c12 AS (SELECT lang, g, string_split(g, ' ')[1] AS w1, COUNT(*) AS n12
        |        FROM bg GROUP BY 1, 2, 3),
        |c1 AS (SELECT lang, w1, SUM(n12) AS n1 FROM c12 GROUP BY 1, 2)
        |SELECT c12.lang, CAST(COUNT(*) AS BIGINT) AS bigram_types,
        |       CAST(SUM(n12) AS BIGINT) AS total_bigrams,
        |       ROUND((SUM(n12 * LN(n1)) - SUM(n12 * LN(n12))) / SUM(n12), 6) AS cond_entropy
        |FROM c12 JOIN c1 ON c12.lang = c1.lang AND c12.w1 = c1.w1
        |GROUP BY c12.lang ORDER BY c12.lang""".stripMargin,

    /** Per-doc n-gram novelty: distinct grams with corpus df = 1,
      * integer floor-div permille (rule F); blind to the Spark side's
      * shared cached df table and row-local sizes. */
    "q_ngram_novelty" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |              WHERE len(string_split(text, ' ')) >= 3),
        |grams AS (SELECT DISTINCT doc_id,
        |                 unnest(list_transform(generate_series(1, CAST(len(t) AS INT) - 2),
        |                        i -> array_to_string(t[i:i+2], ' '))) AS gram
        |          FROM toks),
        |df AS (SELECT gram, COUNT(*) AS gdf FROM grams GROUP BY gram)
        |SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
        |       CAST(SUM(CASE WHEN d.gdf = 1 THEN 1 ELSE 0 END) AS BIGINT) AS novel_grams,
        |       (CAST(SUM(CASE WHEN d.gdf = 1 THEN 1 ELSE 0 END) AS BIGINT) * 1000)
        |         // CAST(COUNT(*) AS BIGINT) AS novelty_permille
        |FROM grams g JOIN df d ON g.gram = d.gram
        |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin,

    /** Stop-gram report: top-25 grams by document frequency, tie
      * broken by gram text (unique total order — rule O makes the
      * LIMIT deterministic); integer floor-div df permille (rule F). */
    "q_boilerplate_grams" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |              WHERE len(string_split(text, ' ')) >= 3),
        |grams AS (SELECT DISTINCT doc_id,
        |                 unnest(list_transform(generate_series(1, CAST(len(t) AS INT) - 2),
        |                        i -> array_to_string(t[i:i+2], ' '))) AS gram
        |          FROM toks),
        |df AS (SELECT gram, CAST(COUNT(*) AS BIGINT) AS gdf FROM grams GROUP BY gram),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM toks)
        |SELECT gram, gdf, (gdf * 1000) // n_docs AS df_permille
        |FROM df, n ORDER BY gdf DESC, gram LIMIT 25""".stripMargin,

    "q_sample_det" ->
      """SELECT lang, COUNT(*) AS n_sampled, MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
        |FROM documents WHERE ((doc_id % 1000000007) * 2654435761) % 1000 < 100
        |GROUP BY lang ORDER BY lang""".stripMargin,

    // PPS sample: integer inclusion decision (the epochShuffleKey
    // uniform vs the weight-scaled threshold); the HT weight is the
    // only float — one identical division per row, rounded per rule F
    "q_pps_sample" ->
      """WITH s AS (SELECT lang, doc_id,
        |             1000000007.0 / LEAST(n_chars * 1000000, 1000000007) AS inv_p
        |           FROM documents
        |           WHERE ((doc_id % 1000000007) * 2654435761) % 1000000007
        |                 < LEAST(n_chars * 1000000, 1000000007))
        |SELECT lang, COUNT(*) AS n_sampled,
        |       MIN(doc_id) AS min_id, MAX(doc_id) AS max_id,
        |       ROUND(SUM(inv_p), 2) AS est_total_docs
        |FROM s GROUP BY lang ORDER BY lang""".stripMargin,

    "q_asof_join" -> asofSql,

    // RANGE frame ordered by us alone — "any click at us' <= us",
    // exactly the operator's comparison (see scaladoc above)
    "q_asof_native" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
        |m AS (SELECT user_id, event_id, event_type, us,
        |             MAX(CASE WHEN event_type = 'click' THEN us END)
        |               OVER (PARTITION BY user_id ORDER BY us
        |                     RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_us
        |      FROM e)
        |SELECT user_id, event_id, COALESCE(us - last_click_us, -1) AS gap_us
        |FROM m WHERE event_type = 'error' ORDER BY user_id, event_id""".stripMargin,

    "q_late_data" ->
      """WITH e AS (SELECT event_type, event_id, epoch_us(ts) AS us FROM events),
        |m AS (SELECT event_type, us,
        |             MAX(us) OVER (ORDER BY event_id
        |                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
        |      FROM e)
        |SELECT event_type,
        |       CAST(SUM(CASE WHEN prev_max - us > 300000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
        |       COUNT(*) AS n
        |FROM m GROUP BY event_type ORDER BY event_type""".stripMargin,

    // ordered-subsequence funnel: '>'-joined per-user type path in
    // (us, event_id) order; LIKE wildcards span the separators and no
    // event type is a substring of another, so the pattern IS ordered
    // subsequence containment
    "q_funnel" ->
      """WITH p AS (SELECT user_id, epoch_us(ts) // 3600000000 AS hour,
        |                  string_agg(event_type, '>' ORDER BY epoch_us(ts), event_id) AS path
        |           FROM events GROUP BY user_id, hour),
        |s AS (SELECT CASE WHEN path LIKE '%view%click%purchase%' THEN 3
        |                  WHEN path LIKE '%view%click%' THEN 2
        |                  WHEN path LIKE '%view%' THEN 1 ELSE 0 END AS stage
        |      FROM p)
        |SELECT CAST(stage AS BIGINT) AS stage, COUNT(*) AS n_sessions
        |FROM s GROUP BY stage ORDER BY stage""".stripMargin,

    // dense hourly spine (range over the global min/max hour) crossed
    // with the distinct types; empty (hour, type) cells zero-filled
    "q_gapfill" ->
      """WITH e AS (SELECT epoch_us(ts) // 3600000000 AS hour, event_type FROM events),
        |b AS (SELECT MIN(hour) AS lo, MAX(hour) AS hi FROM e),
        |spine AS (SELECT unnest(range(lo, hi + 1)) AS hour FROM b),
        |t AS (SELECT DISTINCT event_type FROM e),
        |a AS (SELECT hour, event_type, COUNT(*) AS n FROM e GROUP BY 1, 2)
        |SELECT s.hour, t.event_type, CAST(COALESCE(a.n, 0) AS BIGINT) AS n
        |FROM spine s CROSS JOIN t
        |LEFT JOIN a ON a.hour = s.hour AND a.event_type = t.event_type
        |ORDER BY 1, 2""".stripMargin,

    // forward fill: the q_gapfill spine with NULL cells, then LOCF
    // via last_value IGNORE NULLS per type. The mean is integer
    // CENTS, half-up via (2·sc + n) // (2·n) — a float ROUND(avg, 2)
    // lands exactly on half-cent ties here (1-2 values per cell) and
    // the engines' tie rules diverge (rule F's hard form)
    "q_forward_fill" ->
      """WITH e AS (SELECT epoch_us(ts) // 3600000000 AS hour, event_type, value FROM events),
        |b AS (SELECT MIN(hour) AS lo, MAX(hour) AS hi FROM e),
        |spine AS (SELECT unnest(range(lo, hi + 1)) AS hour FROM b),
        |t AS (SELECT DISTINCT event_type FROM e),
        |a AS (SELECT hour, event_type,
        |             (CAST(ROUND(SUM(value) * 100) AS BIGINT) * 2 + COUNT(*))
        |               // (COUNT(*) * 2) AS v_cents
        |      FROM e GROUP BY 1, 2),
        |dense AS (SELECT s.hour, t.event_type, a.v_cents
        |          FROM spine s CROSS JOIN t
        |          LEFT JOIN a ON a.hour = s.hour AND a.event_type = t.event_type),
        |filled AS (SELECT hour, event_type,
        |                  LAST_VALUE(v_cents IGNORE NULLS)
        |                    OVER (PARTITION BY event_type ORDER BY hour
        |                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_cents
        |           FROM dense)
        |SELECT hour, event_type, COALESCE(v_cents, -1) AS v_cents
        |FROM filled ORDER BY 1, 2""".stripMargin,

    // hour-over-hour delta on the dense spine (the q_gapfill CTE chain
    // + one partitioned LAG; first hour's delta = its own count)
    "q_hourly_delta" ->
      """WITH e AS (SELECT epoch_us(ts) // 3600000000 AS hour, event_type FROM events),
        |b AS (SELECT MIN(hour) AS lo, MAX(hour) AS hi FROM e),
        |spine AS (SELECT unnest(range(lo, hi + 1)) AS hour FROM b),
        |t AS (SELECT DISTINCT event_type FROM e),
        |a AS (SELECT hour, event_type, COUNT(*) AS n FROM e GROUP BY 1, 2),
        |dense AS (SELECT s.hour, t.event_type, CAST(COALESCE(a.n, 0) AS BIGINT) AS n
        |          FROM spine s CROSS JOIN t
        |          LEFT JOIN a ON a.hour = s.hour AND a.event_type = t.event_type)
        |SELECT hour, event_type, n,
        |       n - LAG(n, 1, 0) OVER (PARTITION BY event_type ORDER BY hour) AS delta
        |FROM dense ORDER BY hour, event_type""".stripMargin,

    // SCD-2 intervalization: each purchase valid until the user's next
    // purchase; open latest version → valid_to -1, is_current 1
    "q_scd2" ->
      """WITH e AS (SELECT user_id, event_id, value, epoch_us(ts) AS us
        |           FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT user_id, event_id, value, us AS valid_from,
        |             LEAD(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS nxt
        |      FROM e)
        |SELECT user_id, event_id, value, valid_from,
        |       COALESCE(nxt, -1) AS valid_to,
        |       CAST(CASE WHEN nxt IS NULL THEN 1 ELSE 0 END AS INT) AS is_current
        |FROM v ORDER BY user_id, valid_from, event_id""".stripMargin,

    // first-order Markov transitions: per-user LAG chain in (µs,
    // event_id) order, corpus-wide (src, dst) counts, probability as
    // floor-permille integer (n*1000 // tot — Spark div ≡ DuckDB //
    // on the non-negative counts)
    "q_markov" ->
      """WITH s AS (SELECT event_type AS dst,
        |                  LAG(event_type) OVER (PARTITION BY user_id
        |                    ORDER BY epoch_us(ts), event_id) AS src
        |           FROM events),
        |c AS (SELECT src, dst, COUNT(*) AS n FROM s
        |      WHERE src IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT src, CAST(SUM(n) AS BIGINT) AS tot FROM c GROUP BY 1)
        |SELECT c.src, c.dst, c.n, c.n * 1000 // t.tot AS p_permille
        |FROM c JOIN t USING (src) ORDER BY 1, 2""".stripMargin,

    // z-score outliers: per-type (mean, stddev_samp) then |z| > 2;
    // max_z rounded (rule F) to absorb cross-engine stddev ulps
    "q_anomaly" ->
      """WITH s AS (SELECT event_type, AVG(value) AS mean, STDDEV_SAMP(value) AS sd
        |           FROM events GROUP BY event_type),
        |z AS (SELECT e.event_type, ABS((e.value - s.mean) / s.sd) AS az
        |      FROM events e JOIN s USING (event_type)
        |      WHERE s.sd > 0 AND ABS((e.value - s.mean) / s.sd) > 2)
        |SELECT event_type, COUNT(*) AS n_outliers, ROUND(MAX(az), 2) AS max_z
        |FROM z GROUP BY event_type ORDER BY event_type""".stripMargin,

    // median/MAD robust outliers: quantile_cont ≡ Spark percentile
    // (bit-identical, the q_equidepth verification); the 3·1.4826
    // threshold is the single literal 4.4478 on both engines
    "q_outlier_mad" ->
      """WITH m AS (SELECT event_type, quantile_cont(value, 0.5) AS med
        |           FROM events GROUP BY 1),
        |d AS (SELECT e.event_type, ABS(e.value - m.med) AS ad, m.med
        |      FROM events e JOIN m USING (event_type)),
        |md AS (SELECT event_type, quantile_cont(ad, 0.5) AS mad FROM d GROUP BY 1)
        |SELECT d.event_type, CAST(COUNT(*) AS BIGINT) AS n_outliers,
        |       ROUND(MAX(d.ad / md.mad), 2) AS max_ratio,
        |       ROUND(MIN(d.med), 2) AS median, ROUND(MIN(md.mad), 2) AS mad_val
        |FROM d JOIN md USING (event_type)
        |WHERE md.mad > 0 AND d.ad > md.mad * 4.4478
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // weekly cohort retention triangle: epoch-week = µs // day // 7,
    // cohort = each user's first active week
    "q_retention" ->
      """WITH uw AS (SELECT DISTINCT user_id,
        |                   (epoch_us(ts) // 86400000000) // 7 AS week
        |            FROM events),
        |c AS (SELECT user_id, MIN(week) AS cohort_week FROM uw GROUP BY user_id)
        |SELECT c.cohort_week, uw.week - c.cohort_week AS weeks_since,
        |       COUNT(DISTINCT uw.user_id) AS n_users
        |FROM uw JOIN c USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // latest-row compaction: the oracle deliberately takes the window
    // form (row_number over the (us, event_id) total order) the Spark
    // side's max(struct) aggregate replaces — parity proves the
    // aggregate selects the identical survivor per user
    "q_dedup_latest" ->
      """SELECT user_id, last_us, last_event_id, last_type, last_value FROM (
        |  SELECT user_id, epoch_us(ts) AS last_us, event_id AS last_event_id,
        |         event_type AS last_type, ROUND(value, 2) AS last_value,
        |         ROW_NUMBER() OVER (PARTITION BY user_id
        |                            ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin,

    // exclusive token prefix sum in doc_id order → fixed-budget
    // context windows; CAST the windowed SUM back to BIGINT (rule I)
    "q_pack_chunks" ->
      """WITH t AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n
        |           FROM documents),
        |p AS (SELECT doc_id, n,
        |             CAST(COALESCE(SUM(n) OVER (ORDER BY doc_id
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |                  AS BIGINT) AS prefix
        |      FROM t)
        |SELECT doc_id, n AS n_tokens,
        |       prefix // 2048 AS start_chunk,
        |       GREATEST(prefix // 2048, (prefix + n - 1) // 2048) AS end_chunk,
        |       GREATEST(prefix // 2048, (prefix + n - 1) // 2048)
        |         - prefix // 2048 + 1 AS n_chunks
        |FROM p ORDER BY doc_id""".stripMargin,

    // sliding 32-token windows, stride 24 (overlap 8), last window
    // shortened to the tail; chunk text is the space-joined token
    // slice — string parity rides on the corpus's single-space
    // separation (same split contract as q_array_funcs)
    "q_chunk_overlap" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks,
        |                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n
        |           FROM documents),
        |c AS (SELECT doc_id, toks, n,
        |             unnest(range(0, 1 + CAST(CEIL(GREATEST(n - 32, 0) / 24.0) AS BIGINT)))
        |               AS chunk_idx
        |      FROM t)
        |SELECT doc_id, chunk_idx, chunk_idx * 24 AS start_tok,
        |       CAST(LEAST(32, n - chunk_idx * 24) AS BIGINT) AS n_tok,
        |       array_to_string(toks[(chunk_idx * 24 + 1):(chunk_idx * 24 + LEAST(32, n - chunk_idx * 24))], ' ')
        |         AS chunk_text
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,

    // corpus-as-its-own-unigram-model scoring; LN == Spark log
    // (natural). Rule-F note: the engines sum the -ln terms in
    // different orders, so the ROUND(.,3) could in principle flap.
    // Measured margin: the document closest to a rounding boundary
    // sits 2.3e-5 milli-units away at sf0.1 (4.9e-4 at sf0.01), vs a
    // worst-case summation-order delta of ~4e-11 milli-units
    // (n≈128 terms, |term|≤~5, double eps) — six orders of safety.
    // CCNet tertiles: the q_unigram_ppl score CTE verbatim + native
    // NTILE(3) per language over the round-3 score (the Spark side's
    // integer NTILE formula over the grouped two-pass rank must land
    // every doc in the same tile). Round-3 tie margin measured at
    // 8.5e-7 vs ~1e-13 summation-order noise — rule F safe, and the
    // ordering key is the SAME rounded value the q_unigram_ppl hash
    // already proves cross-engine-equal.
    "q_ppl_bucket" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |cnt AS (SELECT token, COUNT(*) AS c FROM tok GROUP BY token),
        |tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS total FROM cnt),
        |sc AS (SELECT t.doc_id, COUNT(*) AS n,
        |              SUM(-LN(CAST(c.c AS DOUBLE) / tot.total)) AS s
        |       FROM tok t JOIN cnt c ON t.token = c.token CROSS JOIN tot
        |       GROUP BY t.doc_id),
        |scored AS (SELECT d.doc_id, d.lang, ROUND(sc.s / sc.n, 3) AS mean_nll
        |           FROM sc JOIN documents d ON sc.doc_id = d.doc_id)
        |SELECT doc_id, lang, mean_nll,
        |       CAST(NTILE(3) OVER (PARTITION BY lang
        |                           ORDER BY mean_nll, doc_id) AS INT) AS bucket
        |FROM scored ORDER BY doc_id""".stripMargin,

    "q_unigram_ppl" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |cnt AS (SELECT token, COUNT(*) AS c FROM tok GROUP BY token),
        |tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS total FROM cnt),
        |sc AS (SELECT t.doc_id, COUNT(*) AS n,
        |              SUM(-LN(CAST(c.c AS DOUBLE) / tot.total)) AS s
        |       FROM tok t JOIN cnt c ON t.token = c.token CROSS JOIN tot
        |       GROUP BY t.doc_id)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens, ROUND(s / n, 3) AS mean_nll
        |FROM sc ORDER BY doc_id""".stripMargin,

    // the open-vocab twin scores the SAME corpus under the SAME model
    // (no unseen tokens, so the LEFT join's count-1 floor never
    // fires): one oracle text serves both, and the hash must agree
    // with both the map-scalar and the equi-join Spark plan
    "q_unigram_open" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |cnt AS (SELECT token, COUNT(*) AS c FROM tok GROUP BY token),
        |tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS total FROM cnt),
        |sc AS (SELECT t.doc_id, COUNT(*) AS n,
        |              SUM(-LN(CAST(c.c AS DOUBLE) / tot.total)) AS s
        |       FROM tok t JOIN cnt c ON t.token = c.token CROSS JOIN tot
        |       GROUP BY t.doc_id)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens, ROUND(s / n, 3) AS mean_nll
        |FROM sc ORDER BY doc_id""".stripMargin,

    // bigram conditional MLE: denominator = prefix count folded from
    // the bigram counts (sums to 1 per prefix); LN == Spark log.
    // Rule-F margin at sf0.1: 1.9e-4 milli-units to the nearest
    // ROUND(.,3) boundary vs ~4e-11 summation-order noise.
    "q_bigram_ppl" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |             WHERE len(string_split(text, ' ')) >= 2),
        |bgs AS (SELECT doc_id,
        |               unnest(list_transform(generate_series(1, CAST(len(t) AS INT) - 1),
        |                      i -> array_to_string(t[i:i+1], ' '))) AS bigram
        |        FROM tok),
        |bc AS (SELECT bigram, COUNT(*) AS c12 FROM bgs GROUP BY bigram),
        |pc AS (SELECT string_split(bigram, ' ')[1] AS w1,
        |              CAST(SUM(c12) AS BIGINT) AS c1
        |       FROM bc GROUP BY 1),
        |sc AS (SELECT b.doc_id, COUNT(*) AS n,
        |              SUM(-LN(CAST(bc.c12 AS DOUBLE) / pc.c1)) AS s
        |       FROM bgs b JOIN bc ON b.bigram = bc.bigram
        |                  JOIN pc ON string_split(b.bigram, ' ')[1] = pc.w1
        |       GROUP BY b.doc_id)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_bigrams, ROUND(s / n, 3) AS mean_nll
        |FROM sc ORDER BY doc_id""".stripMargin,

    // the same overflow-safe multiplicative hash as q_sample_det,
    // seeded: reduce mod P BEFORE the Knuth multiply (product < 2^62)
    "q_shuffle_det" ->
      """SELECT doc_id,
        |       ((((doc_id % 1000000007) + 20260812) % 1000000007)
        |        * 2654435761) % 1000000007 AS shuffle_key
        |FROM documents ORDER BY shuffle_key, doc_id LIMIT 100""".stripMargin,

    // exact-k weighted sample: same integer scramble as
    // q_shuffle_det (seed 20260813), u = (h+1)/(P+1), A-ES key =
    // ln(u)/weight, top-100 cut, float key not emitted
    "q_weighted_sample" ->
      """SELECT doc_id, lang, n_chars FROM (
        |  SELECT doc_id, lang, n_chars,
        |         ln((((((doc_id % 1000000007) + 20260813) % 1000000007)
        |              * 2654435761) % 1000000007 + 1) / 1000000008.0)
        |           / n_chars AS key
        |  FROM documents WHERE n_chars > 0
        |  ORDER BY key DESC, doc_id LIMIT 100)
        |ORDER BY doc_id""".stripMargin,

    // exact-count stratified sampling: the n smallest seeded shuffle
    // keys per stratum (bijection of ids — no ties possible)
    "q_stratified_sample" ->
      """WITH k AS (SELECT lang, doc_id,
        |                  ((((doc_id % 1000000007) + 7) % 1000000007)
        |                   * 2654435761) % 1000000007 AS key
        |           FROM documents),
        |r AS (SELECT lang, doc_id,
        |             CAST(ROW_NUMBER() OVER (PARTITION BY lang
        |                                     ORDER BY key, doc_id) AS INT) AS pos
        |      FROM k)
        |SELECT lang, doc_id, pos FROM r WHERE pos <= 40
        |ORDER BY lang, pos""".stripMargin,

    // near-dup removal: the recursive-CTE components of the same pair
    // graph give min-label reps; keep = NOT a non-rep member
    "q_dedup_drop" ->
      s"""WITH RECURSIVE $ngramCtes,
        |edges AS (SELECT doc_a AS a, doc_b AS b FROM scored
        |          UNION ALL SELECT doc_b, doc_a FROM scored),
        |reach(node, lab) AS (
        |  SELECT a, a FROM (SELECT DISTINCT a FROM edges) t
        |  UNION
        |  SELECT e.b, r.lab FROM reach r JOIN edges e ON e.a = r.node
        |),
        |cc AS (SELECT node, MIN(lab) AS rep FROM reach GROUP BY node),
        |dropped AS (SELECT node FROM cc WHERE node <> rep)
        |SELECT lang, COUNT(*) AS n_kept, CAST(SUM(doc_id) AS BIGINT) AS sum_kept_ids,
        |       CAST(SUM(n_chars) AS BIGINT) AS kept_chars
        |FROM documents WHERE doc_id NOT IN (SELECT node FROM dropped)
        |GROUP BY lang ORDER BY lang""".stripMargin,

    // the round-5 layout composition: removal (recursive-CTE CC) →
    // quality gate (integer permille) → stratified cap (seeded keys)
    // → packing (windowed prefix sum) → per-lang budget
    "q_pipeline_layout" ->
      s"""WITH RECURSIVE $ngramCtes,
        |edges AS (SELECT doc_a AS a, doc_b AS b FROM scored
        |          UNION ALL SELECT doc_b, doc_a FROM scored),
        |reach(node, lab) AS (
        |  SELECT a, a FROM (SELECT DISTINCT a FROM edges) t
        |  UNION
        |  SELECT e.b, r.lab FROM reach r JOIN edges e ON e.a = r.node
        |),
        |cc AS (SELECT node, MIN(lab) AS rep FROM reach GROUP BY node),
        |dropped AS (SELECT node FROM cc WHERE node <> rep),
        |q AS (SELECT doc_id, lang,
        |             len(string_split(text, ' ')) AS n,
        |             len(list_filter(string_split(text, ' '),
        |                             t -> t = 'the' OR t = 'a')) AS stops
        |      FROM documents WHERE doc_id NOT IN (SELECT node FROM dropped)),
        |gated AS (SELECT doc_id, lang, CAST(n AS BIGINT) AS n FROM q
        |          WHERE LEAST(n, 50) * (n - stops) * 1000 // (50 * n) >= 400),
        |keyed AS (SELECT doc_id, lang, n,
        |                 ((((doc_id % 1000000007) + 11) % 1000000007)
        |                  * 2654435761) % 1000000007 AS key
        |          FROM gated),
        |capped AS (SELECT doc_id, lang, n FROM (
        |    SELECT doc_id, lang, n,
        |           ROW_NUMBER() OVER (PARTITION BY lang ORDER BY key, doc_id) AS r
        |    FROM keyed) t WHERE r <= 30),
        |p AS (SELECT doc_id, lang, n,
        |             CAST(COALESCE(SUM(n) OVER (ORDER BY doc_id
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |                  AS BIGINT) AS prefix
        |      FROM capped),
        |ch AS (SELECT lang, n, prefix // 1024 AS sc,
        |              GREATEST(prefix // 1024, (prefix + n - 1) // 1024) AS ec
        |       FROM p)
        |SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n) AS BIGINT) AS tokens,
        |       CAST(SUM(ec - sc + 1) AS BIGINT) AS chunk_spans, MAX(ec) AS last_chunk
        |FROM ch GROUP BY lang ORDER BY lang""".stripMargin,

    // batch exact kNN: q_sim_search's widen-then-multiply DOUBLE dot,
    // generalized to 5 probes with a per-probe rank. Rule-F margins
    // measured at sf0.1: min adjacent top-6 score gap 5.5e-4 (rank
    // stability) and min ROUND(.,3) boundary distance 6.7e-3
    // milli-units, vs ~7e-13 worst-case 64-term summation-order noise.
    "q_knn_join" ->
      """WITH probes AS (SELECT vec_id AS probe_id, embedding AS p FROM embeddings
        |                WHERE vec_id < 5),
        |ex AS (SELECT pr.probe_id, e.vec_id,
        |              CAST(e.embedding[CAST(t.i AS INT)] AS DOUBLE) *
        |              CAST(pr.p[CAST(t.i AS INT)] AS DOUBLE) AS prod
        |       FROM embeddings e, probes pr, range(1, 65) t(i) WHERE e.vec_id >= 5),
        |sc AS (SELECT probe_id, vec_id, SUM(prod) AS score FROM ex GROUP BY 1, 2),
        |ranked AS (SELECT probe_id, vec_id, score,
        |                  CAST(ROW_NUMBER() OVER (PARTITION BY probe_id
        |                                          ORDER BY score DESC, vec_id) AS INT) AS rk
        |           FROM sc)
        |SELECT probe_id, vec_id, ROUND(score, 3) AS score, rk FROM ranked
        |WHERE rk <= 5 ORDER BY probe_id, rk""".stripMargin,

    // kNN majority-vote classification: same DOUBLE widen-then-multiply
    // dot as q_knn_join, 20 probes; measured min rank-5/6 score gap
    // 1.9e-5 (sf0.01) / 2.2e-4 (sf0.1) vs ~1e-13 summation-order noise,
    // so the vote set is cross-engine stable; vote argmax tie-breaks by
    // smallest label on both sides
    "q_knn_classify" ->
      """WITH probes AS (SELECT vec_id AS probe_id, embedding AS p, label AS true_label
        |                FROM embeddings WHERE vec_id < 20),
        |ex AS (SELECT pr.probe_id, e.vec_id, e.label,
        |              CAST(e.embedding[CAST(t.i AS INT)] AS DOUBLE) *
        |              CAST(pr.p[CAST(t.i AS INT)] AS DOUBLE) AS prod
        |       FROM embeddings e, probes pr, range(1, 65) t(i) WHERE e.vec_id >= 20),
        |sc AS (SELECT probe_id, vec_id, MIN(label) AS label, SUM(prod) AS score
        |       FROM ex GROUP BY 1, 2),
        |ranked AS (SELECT probe_id, label,
        |                  ROW_NUMBER() OVER (PARTITION BY probe_id
        |                                     ORDER BY score DESC, vec_id) AS rk
        |           FROM sc),
        |v AS (SELECT probe_id, label, CAST(COUNT(*) AS BIGINT) AS votes
        |      FROM ranked WHERE rk <= 5 GROUP BY 1, 2),
        |best AS (SELECT probe_id, label AS pred_label, votes,
        |                ROW_NUMBER() OVER (PARTITION BY probe_id
        |                                   ORDER BY votes DESC, label) AS brk
        |         FROM v)
        |SELECT b.probe_id, pr.true_label, b.pred_label, b.votes,
        |       CAST(b.pred_label = pr.true_label AS INT) AS correct
        |FROM best b JOIN probes pr USING (probe_id) WHERE brk = 1
        |ORDER BY probe_id""".stripMargin,

    // triangle census: id-ordered 3-way self-join (x<y<z — each
    // triangle once); wedges from the degree table; clustering =
    // 3T/wedges, one integer division, rounded by convention
    "q_triangle_count" ->
      s"""WITH $coPurchaseCtes,
         |deg AS (SELECT v, COUNT(*) AS d
         |        FROM (SELECT a AS v FROM e UNION ALL SELECT b FROM e) GROUP BY v),
         |tri AS (SELECT COUNT(*) AS t FROM e e1
         |        JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
         |        JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b),
         |agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
         |               CAST(SUM((d * (d - 1)) // 2) AS BIGINT) AS n_wedges FROM deg),
         |ne AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM e)
         |SELECT agg.n_nodes, ne.n_edges, agg.n_wedges,
         |       CAST(tri.t AS BIGINT) AS n_triangles,
         |       ROUND(3.0 * tri.t / GREATEST(agg.n_wedges, 1), 6) AS clustering
         |FROM agg, ne, tri ORDER BY n_nodes""".stripMargin,

    "q_pagerank" -> pagerankSql,

    "q_kcore" -> kcoreSql,

    "q_communities" -> communitiesSql,

    // BFS distances via a bounded MONOTONE recursive CTE: UNION
    // dedups (node, dist) pairs so cycles terminate under the
    // dist < 20 bound; MIN(dist) per node collapses the walk to the
    // BFS distance; the Spark facade requires exhaustion within the
    // same 20 hops loudly
    "q_shortest_path" ->
      s"""WITH RECURSIVE $coPurchaseCtes,
         |dir AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
         |src AS (SELECT MIN(a) AS m FROM e),
         |walk(node, dist) AS (
         |  SELECT m, 0 FROM src
         |  UNION
         |  SELECT dir.b, walk.dist + 1 FROM walk JOIN dir ON dir.a = walk.node
         |  WHERE walk.dist < 20)
         |SELECT node AS part, CAST(MIN(dist) AS INT) AS dist
         |FROM walk GROUP BY node ORDER BY part""".stripMargin,

    // association rules: all three measures in exact integer permille
    // (// ≡ Spark div on non-negative counts); b is the DISTINCT
    // (basket, item) incidence, N the distinct basket count
    // degree distribution over the same co-purchase edge CTEs
    "q_degree_dist" ->
      s"""WITH $coPurchaseCtes,
         |deg AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS deg
         |        FROM (SELECT a AS v FROM e UNION ALL SELECT b FROM e)
         |        GROUP BY v)
         |SELECT deg, CAST(COUNT(*) AS BIGINT) AS n_nodes
         |FROM deg GROUP BY deg ORDER BY deg""".stripMargin,

    // EWMA: the recurrence runs as a recursive CTE over per-type
    // row-numbered hourly means; inputs pre-rounded to 6dp so both
    // engines feed bit-identical x_t, constants written 0.25 /
    // (1 - 0.25) to match the Spark fold literally
    "q_ewma" ->
      """WITH RECURSIVE h AS (
        |  SELECT event_type, epoch_us(ts) // 3600000000 AS hour,
        |         ROUND(AVG(value), 6) AS x
        |  FROM events GROUP BY 1, 2),
        |o AS (SELECT event_type, hour, x,
        |             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hour) AS rn
        |      FROM h),
        |r AS (
        |  SELECT event_type, hour, rn, x AS s FROM o WHERE rn = 1
        |  UNION ALL
        |  SELECT o.event_type, o.hour, o.rn, 0.25 * o.x + (1 - 0.25) * r.s
        |  FROM r JOIN o ON o.event_type = r.event_type AND o.rn = r.rn + 1)
        |SELECT event_type, hour, ROUND(s, 4) AS ewma FROM r
        |ORDER BY event_type, hour""".stripMargin,

    // Welch's t: identical operation tree as the Spark facade
    "q_welch_ttest" ->
      """WITH s AS (SELECT event_type AS g, COUNT(value) AS n, AVG(value) AS m,
        |                  VAR_SAMP(value) AS v
        |           FROM events GROUP BY 1)
        |SELECT a.g AS type_a, b.g AS type_b, a.n AS n_a, b.n AS n_b,
        |       ROUND((a.m - b.m) / sqrt(a.v / a.n + b.v / b.n), 4) AS t,
        |       ROUND((a.v / a.n + b.v / b.n) * (a.v / a.n + b.v / b.n) /
        |             ((a.v / a.n) * (a.v / a.n) / (a.n - 1) +
        |              (b.v / b.n) * (b.v / b.n) / (b.n - 1)), 2) AS dof
        |FROM s a JOIN s b ON a.g < b.g
        |WHERE a.n >= 2 AND b.n >= 2 AND (a.v / a.n + b.v / b.n) > 0
        |ORDER BY type_a, type_b""".stripMargin,

    // pairwise KL over add-one-smoothed source unigram distributions;
    // totals cast BIGINT (DuckDB SUM(int) is HUGEINT) so the smoothed
    // p divides double/bigint exactly like Spark's double/long
    "q_kl_source" ->
      """WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS w FROM documents),
        |c AS (SELECT source AS g, w, COUNT(*) AS c FROM t GROUP BY 1, 2),
        |n AS (SELECT g, CAST(SUM(c) AS BIGINT) AS n FROM c GROUP BY 1),
        |v AS (SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS nv FROM c),
        |vw AS (SELECT DISTINCT w FROM c),
        |p AS (SELECT n.g, vw.w, (COALESCE(c.c, 0) + 1.0) / (n.n + v.nv) AS p
        |      FROM n CROSS JOIN vw CROSS JOIN v
        |      LEFT JOIN c ON c.g = n.g AND c.w = vw.w)
        |SELECT a.g AS src_a, b.g AS src_b, ROUND(SUM(a.p * ln(a.p / b.p)), 6) AS kl
        |FROM p a JOIN p b ON a.w = b.w AND a.g <> b.g
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // correlation matrix: one aggregate row melted long — pair order
    // is the Spark cols order, final sort lexicographic on both sides
    "q_corr_matrix" ->
      """WITH c AS (SELECT corr(l_quantity, l_extendedprice) AS qp,
        |                  corr(l_quantity, l_discount) AS qd,
        |                  corr(l_quantity, l_tax) AS qt,
        |                  corr(l_extendedprice, l_discount) AS pd,
        |                  corr(l_extendedprice, l_tax) AS pt,
        |                  corr(l_discount, l_tax) AS dt
        |           FROM lineitem)
        |SELECT var_a, var_b, corr FROM (
        |  SELECT 'l_quantity' AS var_a, 'l_extendedprice' AS var_b, ROUND(qp, 4) AS corr FROM c
        |  UNION ALL SELECT 'l_quantity', 'l_discount', ROUND(qd, 4) FROM c
        |  UNION ALL SELECT 'l_quantity', 'l_tax', ROUND(qt, 4) FROM c
        |  UNION ALL SELECT 'l_extendedprice', 'l_discount', ROUND(pd, 4) FROM c
        |  UNION ALL SELECT 'l_extendedprice', 'l_tax', ROUND(pt, 4) FROM c
        |  UNION ALL SELECT 'l_discount', 'l_tax', ROUND(dt, 4) FROM c)
        |ORDER BY var_a, var_b""".stripMargin,

    // BM25 at (k1=1.2, b=0.75) over exact-integer tf/df/len stats —
    // the score expression mirrors Graft.bm25's tree term by term
    // (terms added in declared order, constants written (1.2 + 1) /
    // (1 - 0.75) identically), so the unrounded score is
    // bit-identical and the rounded cut cannot flap
    "q_bm25" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |d AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS len,
        |             CAST(len(list_filter(tk, x -> x = 'hash')) AS BIGINT) AS tf_0,
        |             CAST(len(list_filter(tk, x -> x = 'scan')) AS BIGINT) AS tf_1,
        |             CAST(len(list_filter(tk, x -> x = 'dup')) AS BIGINT) AS tf_2
        |      FROM t),
        |s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(len) AS BIGINT) AS sl,
        |             CAST(SUM(CASE WHEN tf_0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_0,
        |             CAST(SUM(CASE WHEN tf_1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_1,
        |             CAST(SUM(CASE WHEN tf_2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_2
        |      FROM d)
        |SELECT doc_id,
        |       ROUND(ln(1 + (n - df_0 + 0.5) / (df_0 + 0.5)) * (tf_0 * (1.2 + 1)) /
        |               (tf_0 + 1.2 * (1 - 0.75 + 0.75 * len / (CAST(sl AS DOUBLE) / n)))
        |           + ln(1 + (n - df_1 + 0.5) / (df_1 + 0.5)) * (tf_1 * (1.2 + 1)) /
        |               (tf_1 + 1.2 * (1 - 0.75 + 0.75 * len / (CAST(sl AS DOUBLE) / n)))
        |           + ln(1 + (n - df_2 + 0.5) / (df_2 + 0.5)) * (tf_2 * (1.2 + 1)) /
        |               (tf_2 + 1.2 * (1 - 0.75 + 0.75 * len / (CAST(sl AS DOUBLE) / n))), 6) AS score
        |FROM d, s
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,

    /** Hybrid RRF: the q_bm25 scorer (mirrored term by term, 6dp) and
      * the q_sim_search dot scorer (unnest-join DOUBLE, 3dp) each
      * ranked to top-100 under (rounded score DESC, doc_id) — the
      * same total order as the Spark side, so neither the cut nor the
      * ranks can flap — then fused by integer reciprocal rank. */
    "q_hybrid_rrf" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |d AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS len,
        |             CAST(len(list_filter(tk, x -> x = 'hash')) AS BIGINT) AS tf_0,
        |             CAST(len(list_filter(tk, x -> x = 'scan')) AS BIGINT) AS tf_1,
        |             CAST(len(list_filter(tk, x -> x = 'dup')) AS BIGINT) AS tf_2
        |      FROM t),
        |s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(len) AS BIGINT) AS sl,
        |             CAST(SUM(CASE WHEN tf_0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_0,
        |             CAST(SUM(CASE WHEN tf_1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_1,
        |             CAST(SUM(CASE WHEN tf_2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_2
        |      FROM d),
        |lex AS (SELECT doc_id,
        |       ROUND(ln(1 + (n - df_0 + 0.5) / (df_0 + 0.5)) * (tf_0 * (1.2 + 1)) /
        |               (tf_0 + 1.2 * (1 - 0.75 + 0.75 * len / (CAST(sl AS DOUBLE) / n)))
        |           + ln(1 + (n - df_1 + 0.5) / (df_1 + 0.5)) * (tf_1 * (1.2 + 1)) /
        |               (tf_1 + 1.2 * (1 - 0.75 + 0.75 * len / (CAST(sl AS DOUBLE) / n)))
        |           + ln(1 + (n - df_2 + 0.5) / (df_2 + 0.5)) * (tf_2 * (1.2 + 1)) /
        |               (tf_2 + 1.2 * (1 - 0.75 + 0.75 * len / (CAST(sl AS DOUBLE) / n))), 6) AS ls
        |FROM d, s),
        |lexr AS (SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY ls DESC, doc_id) AS INT) AS lex_rank
        |         FROM lex QUALIFY lex_rank <= 100),
        |probe AS (SELECT embedding AS p FROM embeddings WHERE vec_id = 0),
        |ex AS (SELECT e.vec_id, CAST(e.embedding[CAST(t.i AS INT)] AS DOUBLE) *
        |              CAST(probe.p[CAST(t.i AS INT)] AS DOUBLE) AS prod
        |       FROM embeddings e, probe, range(1, 65) t(i) WHERE e.vec_id <> 0),
        |den AS (SELECT vec_id AS doc_id, ROUND(SUM(prod), 3) AS ds FROM ex GROUP BY vec_id),
        |denr AS (SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY ds DESC, doc_id) AS INT) AS dense_rank
        |         FROM den QUALIFY dense_rank <= 100)
        |SELECT COALESCE(l.doc_id, r.doc_id) AS doc_id, l.lex_rank, r.dense_rank,
        |       CAST(COALESCE(1000000 // (60 + l.lex_rank), 0) +
        |            COALESCE(1000000 // (60 + r.dense_rank), 0) AS BIGINT) AS rrf_micro
        |FROM lexr l FULL OUTER JOIN denr r ON l.doc_id = r.doc_id
        |ORDER BY rrf_micro DESC, doc_id LIMIT 20""".stripMargin,

    // χ²: dense contingency grid (absent cells O=0, E>0), E computed
    // double-first exactly like the facade
    "q_chisq" ->
      """WITH e AS (SELECT event_type AS a,
        |                  (epoch_us(ts) // 86400000000 + 4) % 7 AS b
        |           FROM events),
        |cells AS (SELECT a, b, COUNT(*) AS o FROM e GROUP BY 1, 2),
        |rt AS (SELECT a, CAST(SUM(o) AS BIGINT) AS ra FROM cells GROUP BY 1),
        |ct AS (SELECT b, CAST(SUM(o) AS BIGINT) AS cb FROM cells GROUP BY 1),
        |n AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells),
        |grid AS (SELECT rt.a, ct.b, COALESCE(cells.o, 0) AS o,
        |                CAST(rt.ra AS DOUBLE) * ct.cb / n.n AS e
        |         FROM rt CROSS JOIN ct CROSS JOIN n
        |         LEFT JOIN cells ON cells.a = rt.a AND cells.b = ct.b)
        |SELECT ROUND(SUM((o - e) * (o - e) / e), 4) AS chisq,
        |       CAST((COUNT(DISTINCT a) - 1) * (COUNT(DISTINCT b) - 1) AS BIGINT) AS dof,
        |       CAST(SUM(o) AS BIGINT) AS n
        |FROM grid ORDER BY n""".stripMargin,

    // trailing exact rolling median + IQR on the dense spine — both
    // engines' continuous quantile interpolates at rank p*(cnt-1), so
    // the exact window percentiles match at 4dp (rule F)
    "q_rolling_median" ->
      """WITH e AS (SELECT epoch_us(ts) // 3600000000 AS hour, event_type FROM events),
        |b AS (SELECT MIN(hour) AS lo, MAX(hour) AS hi FROM e),
        |spine AS (SELECT unnest(range(lo, hi + 1)) AS hour FROM b),
        |t AS (SELECT DISTINCT event_type FROM e),
        |a AS (SELECT hour, event_type, COUNT(*) AS n FROM e GROUP BY 1, 2),
        |dense AS (SELECT s.hour, t.event_type, CAST(COALESCE(a.n, 0) AS BIGINT) AS n
        |          FROM spine s CROSS JOIN t
        |          LEFT JOIN a ON a.hour = s.hour AND a.event_type = t.event_type)
        |SELECT hour, event_type, n,
        |       ROUND(quantile_cont(n, 0.5) OVER w, 4) AS med5,
        |       ROUND(quantile_cont(n, 0.75) OVER w - quantile_cont(n, 0.25) OVER w, 4) AS iqr5
        |FROM dense
        |WINDOW w AS (PARTITION BY event_type ORDER BY hour
        |             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        |ORDER BY hour, event_type""".stripMargin,

    // trailing 3-hour moving average on the dense spine (the
    // q_hourly_delta spine construction)
    "q_rolling" ->
      """WITH e AS (SELECT epoch_us(ts) // 3600000000 AS hour, event_type FROM events),
        |b AS (SELECT MIN(hour) AS lo, MAX(hour) AS hi FROM e),
        |spine AS (SELECT unnest(range(lo, hi + 1)) AS hour FROM b),
        |t AS (SELECT DISTINCT event_type FROM e),
        |a AS (SELECT hour, event_type, COUNT(*) AS n FROM e GROUP BY 1, 2),
        |dense AS (SELECT s.hour, t.event_type, CAST(COALESCE(a.n, 0) AS BIGINT) AS n
        |          FROM spine s CROSS JOIN t
        |          LEFT JOIN a ON a.hour = s.hour AND a.event_type = t.event_type)
        |SELECT hour, event_type, n,
        |       ROUND(AVG(n) OVER (PARTITION BY event_type ORDER BY hour
        |                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS ma3
        |FROM dense ORDER BY hour, event_type""".stripMargin,

    // lag-1 autocorrelation of the dense hourly count series per type
    "q_autocorr" ->
      """WITH e AS (SELECT epoch_us(ts) // 3600000000 AS hour, event_type FROM events),
        |b AS (SELECT MIN(hour) AS lo, MAX(hour) AS hi FROM e),
        |spine AS (SELECT unnest(range(lo, hi + 1)) AS hour FROM b),
        |t AS (SELECT DISTINCT event_type FROM e),
        |a AS (SELECT hour, event_type, COUNT(*) AS n FROM e GROUP BY 1, 2),
        |dense AS (SELECT s.hour, t.event_type, CAST(COALESCE(a.n, 0) AS BIGINT) AS n
        |          FROM spine s CROSS JOIN t
        |          LEFT JOIN a ON a.hour = s.hour AND a.event_type = t.event_type),
        |lagged AS (SELECT event_type, n,
        |                  LAG(n, 1) OVER (PARTITION BY event_type ORDER BY hour) AS n_prev
        |           FROM dense)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_hours,
        |       ROUND(corr(n, n_prev), 4) AS ac1
        |FROM lagged WHERE n_prev IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Gini over exact per-customer floor-cents; the ROW_NUMBER form
    // states the same (cents ASC, custkey DESC) total order the
    // facade's two-pass distributed rank produces; both Σ folds cast
    // double BEFORE summing (Spark sum(long) wraps, DuckDB widens to
    // HUGEINT — double-first is the one shared form)
    "q_gini" ->
      """WITH rev AS (SELECT o_custkey AS c,
        |                    CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
        |             FROM orders GROUP BY 1),
        |r AS (SELECT CAST(cents AS DOUBLE) AS x,
        |             CAST(ROW_NUMBER() OVER (ORDER BY cents ASC, c DESC) AS DOUBLE) AS i,
        |             COUNT(*) OVER () AS n
        |      FROM rev)
        |SELECT CAST(MAX(n) AS BIGINT) AS n_customers,
        |       ROUND(2.0 * SUM(i * x) / (MAX(n) * SUM(x)) - (MAX(n) + 1.0) / MAX(n), 6) AS gini
        |FROM r ORDER BY n_customers""".stripMargin,

    "q_basket_rules" ->
      """WITH b AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem),
        |n AS (SELECT CAST(COUNT(DISTINCT bk) AS BIGINT) AS nb FROM b),
        |ic AS (SELECT it, COUNT(*) AS n_item FROM b GROUP BY it),
        |p AS (SELECT a.it AS item_a, b2.it AS item_b, COUNT(*) AS n_both
        |      FROM b a JOIN b b2 ON a.bk = b2.bk AND a.it < b2.it
        |      GROUP BY 1, 2 HAVING COUNT(*) >= 2)
        |SELECT p.item_a, p.item_b, p.n_both,
        |       (p.n_both * 1000) // ia.n_item AS conf_ab_permille,
        |       (p.n_both * 1000) // ib.n_item AS conf_ba_permille,
        |       (p.n_both * n.nb * 1000) // (ia.n_item * ib.n_item) AS lift_permille
        |FROM p JOIN ic ia ON p.item_a = ia.it
        |       JOIN ic ib ON p.item_b = ib.it, n
        |ORDER BY item_a, item_b""".stripMargin,

    /** q_media_stats' oracle recomputes every feature from first
      * principles, blind to the Scala stub: payload bytes via
      * octet_length(encode(text)) (UTF-8, ≡ Spark's binary cast),
      * sampled frames by the closed form of "ceil(len/64) frames,
      * every 4th from index 0", separator bytes by stripping the
      * [ -/] class (0x20–0x2F — histogram bin 2) — exact on this
      * all-ASCII corpus where chars ≡ bytes. Rule I casts the
      * HUGEINT sums; kind is a unique 3-row sort key (rule O). */
    "q_media_stats" ->
      """WITH media AS (
        |  SELECT CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
        |              WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |         octet_length(encode(text)) AS n_bytes,
        |         ((octet_length(encode(text)) + 63) // 64 + 3) // 4 AS frames_sampled,
        |         length(text) - length(regexp_replace(text, '[ -/]', '', 'g')) AS sep
        |  FROM documents)
        |SELECT kind, COUNT(*) AS n_media,
        |       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
        |       CAST(SUM(frames_sampled) AS BIGINT) AS total_frames,
        |       CAST(SUM(sep) AS BIGINT) AS sep_bytes
        |FROM media GROUP BY kind ORDER BY kind""".stripMargin,

    /** q_media_decode's oracle verifies the ENTIRE encode→ImageIO-
      * decode→pixel-histogram loop from first principles: gray pixels
      * make decoded luminance ≡ text byte value, so pixel counts per
      * luminance class are character-class counts on the TEXT —
      * n_pixels = UTF-8 byte count, bin 2 = [ -/] (0x20–0x2F), bin 6 =
      * [\x60-\x6f], bin 7 = [\x70-\x7f]. If the Scala side had stubbed
      * the decode (byte histogram over the BMP payload) every count
      * would be off by the 54-byte header + row padding. Rule I casts;
      * doc_id unique (rule O). */
    "q_media_decode" ->
      """SELECT doc_id,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS n_pixels,
        |       CAST(length(text) - length(regexp_replace(text, '[ -/]', '', 'g')) AS BIGINT) AS sep_pixels,
        |       CAST(length(text) - length(regexp_replace(text, '[\x60-\x6f]', '', 'g')) AS BIGINT) AS lo_alpha,
        |       CAST(length(text) - length(regexp_replace(text, '[\x70-\x7f]', '', 'g')) AS BIGINT) AS hi_alpha
        |FROM documents WHERE length(text) >= 1 ORDER BY doc_id""".stripMargin,

    /** q_media_audio's oracle verifies the ENTIRE encode→WAV-decode→
      * sample-histogram loop the same way q_media_decode's does for
      * pixels: 8-bit unsigned PCM makes decoded sample ≡ text byte
      * value, so sample counts per class are character-class counts
      * on the TEXT. A stubbed byte histogram over the WAV payload
      * would count the 44-byte RIFF header too and fail the hash.
      * Rule I casts; doc_id unique (rule O). */
    "q_media_audio" ->
      """SELECT doc_id,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS n_samples,
        |       CAST(length(text) - length(regexp_replace(text, '[ -/]', '', 'g')) AS BIGINT) AS sep_samples,
        |       CAST(length(text) - length(regexp_replace(text, '[\x60-\x6f]', '', 'g')) AS BIGINT) AS lo_alpha,
        |       CAST(length(text) - length(regexp_replace(text, '[\x70-\x7f]', '', 'g')) AS BIGINT) AS hi_alpha
        |FROM documents WHERE length(text) >= 1 ORDER BY doc_id""".stripMargin,

    /** Frame-sampled video decode: the oracle reassembles exactly the
      * even-indexed 64-char frames of the text (list_filter over the
      * frame index range — the stride-2 keyframe sample), space-pads
      * the last frame when and only when it is sampled ((nf−1) even),
      * and counts character classes — blind to GIF, ImageIO and the
      * Scala histogram. Gray pixels make luminance ≡ byte value, so
      * these char-class counts ARE the pixel-histogram bins. */
    "q_media_video" ->
      """WITH d AS (SELECT doc_id, text AS txt,
        |                  CAST(length(text) AS BIGINT) AS n,
        |                  CAST((length(text) + 63) // 64 AS BIGINT) AS nf
        |           FROM documents
        |           WHERE length(text) >= 1
        |             AND length(text) = octet_length(encode(text))
        |             AND octet_length(encode(text)) <= 262144),
        |s AS (SELECT doc_id, nf,
        |             array_to_string(list_transform(
        |               list_filter(range(0, nf), i -> i % 2 = 0),
        |               i -> substr(txt, CAST(i * 64 + 1 AS INT), 64)), '') AS st,
        |             CASE WHEN (nf - 1) % 2 = 0 THEN (64 - n % 64) % 64 ELSE 0 END AS pad
        |      FROM d)
        |SELECT doc_id, nf AS n_frames,
        |       CAST((nf + 1) // 2 AS BIGINT) AS frames_sampled,
        |       CAST(length(st) + pad AS BIGINT) AS n_pixels,
        |       CAST(length(st) - length(regexp_replace(st, '[ -/]', '', 'g')) + pad AS BIGINT) AS sep_pixels,
        |       CAST(length(st) - length(regexp_replace(st, '[\x60-\x6f]', '', 'g')) AS BIGINT) AS lo_alpha,
        |       CAST(length(st) - length(regexp_replace(st, '[\x70-\x7f]', '', 'g')) AS BIGINT) AS hi_alpha
        |FROM s ORDER BY doc_id""".stripMargin,

    // exact media-asset dedup: content key = md5 — DuckDB md5(text)
    // hashes the string's UTF-8 bytes, Spark md5(payload) the binary
    // cast of the same text, identical on this pure-ASCII corpus (the
    // q_media_stats oracle gates purity); per-digest count + bytes,
    // per-kind rollup, all integers (rule I)
    "q_media_dedup" ->
      """WITH m AS (SELECT CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
        |                WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |                md5(text) AS digest,
        |                octet_length(encode(text)) AS bytes
        |           FROM documents),
        |g AS (SELECT kind, digest, COUNT(*) AS cnt, MAX(bytes) AS bytes
        |      FROM m GROUP BY kind, digest)
        |SELECT kind, CAST(SUM(cnt) AS BIGINT) AS n_assets,
        |       CAST(COUNT(*) AS BIGINT) AS uniq_assets,
        |       CAST(SUM(cnt) - COUNT(*) AS BIGINT) AS dup_assets,
        |       CAST(SUM(bytes * cnt) AS BIGINT) AS bytes_total,
        |       CAST(SUM(bytes * cnt) - SUM(bytes) AS BIGINT) AS bytes_saved
        |FROM g GROUP BY kind ORDER BY kind""".stripMargin
  )
}
