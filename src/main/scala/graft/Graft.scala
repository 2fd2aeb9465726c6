package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The user-facing operator API: the generic, reusable forms of the
  * operators the `SparkEntry.queries` demos exercise against the test
  * tables. Everything here takes the caller's own DataFrames/Columns;
  * nothing is bound to the test corpus. Each method is the exact logic
  * a declared query runs (and is tested for equivalence in GraftSpec),
  * so correctness transfers from the oracle-verified query set.
  */
object Graft {

  /** Left as-of join: append to `left` the nearest same-keyed
    * `rightTime` at-or-before (`direction = "backward"`, default) or
    * at-or-after (`"forward"`) `leftTime` — NULL if none, or if the
    * nearest match is further than `tolerance` (LongType times only).
    * Key/time columns may be ANY orderable atomic type. Executed by
    * the custom [[graft.plans.AsOfJoinExec]] operator — one exchange +
    * sort per side, single-pass O(1)-state merge. */
  def asofJoin(left: DataFrame, right: DataFrame,
               leftKey: String, leftTime: String,
               rightKey: String, rightTime: String,
               outCol: String = "asof_time",
               direction: String = "backward",
               tolerance: Option[Long] = None): DataFrame =
    plans.AsOfJoin.asof(left, right, leftKey, leftTime, rightKey, rightTime,
                        outCol, direction, tolerance)

  /** Skew-safe equi-join of a large skewed side against a small side
    * by replicating the small side across `salts` shards. */
  def saltedJoin(large: DataFrame, small: DataFrame,
                 largeKey: Column, smallKey: Column, salts: Int): DataFrame =
    operators.SkewJoin.saltedJoin(large, small, largeKey, smallKey, salts)

  /** Native codegen'd dot product of two double arrays. */
  def dot(a: Column, b: Column): Column = functions.GraftFunctions.dot(a, b)

  /** Native codegen'd count of positions where two equal-length long
    * arrays match (the MinHash signature-agreement kernel). */
  def matchCount(a: Column, b: Column): Column =
    functions.ArrayMatchCount.matchCount(a, b)

  /** Deterministic ~`keepPermille`/1000 sample decision on a stable
    * long id: engine-, run- and parallelism-independent (q_sample_det's
    * overflow-safe multiplicative hash — the id is reduced mod 1e9+7
    * before the Knuth multiply so the product stays under 2^62). */
  def deterministicKeep(id: Column, keepPermille: Int): Column =
    pmod(pmod(id, lit(1000000007L)) * 2654435761L, lit(1000)) < keepPermille

  /** Gopher-style repetition-quality signals for a whitespace-token
    * text column: (duplicate-token, duplicate-2-gram, duplicate-3-gram)
    * permilles as a struct. Pure per-row computation. A document with
    * fewer than n tokens has no n-gram, so its field is NULL (the
    * `when` guard also prevents `sequence(1, 0)` from producing the
    * descending [1,0] and faulting `slice` on short docs). */
  def repetitionScores(text: Column): Column = {
    val t = split(text, " ")
    def grams(n: Int) = transform(sequence(lit(1), size(t) - (n - 1)),
      i => concat_ws(" ", slice(t, i, lit(n))))
    def dupPermille(arr: Column) =
      floor((size(arr).cast("long") - size(array_distinct(arr))) * 1000 / size(arr))
        .cast("long")
    def guarded(n: Int) = when(size(t) >= n, dupPermille(grams(n)))
    struct(guarded(1).as("dup_tok_permille"),
           guarded(2).as("dup_g2_permille"),
           guarded(3).as("dup_g3_permille"))
  }

  /** MinHash signature of a token column, as an aggregation over the
    * rows of one group (`groupBy(docId).agg(minhashSignature(col))`).
    * Partial buffers merge element-wise-min — combiner-safe. */
  def minhashSignature(token: Column): Column = udaf(MinHash.agg).apply(token)

  /** TF-weighted 64-bit SimHash of (token, tf) rows of one group. */
  def simhashSignature(token: Column, tf: Column): Column =
    udaf(SimHash.agg).apply(token, tf)

  /** Exact content fingerprint for dedup grouping: the sorted token
    * multiset of a whitespace-token text column. */
  def contentFingerprint(text: Column): Column =
    array_join(array_sort(split(text, " ")), " ")

  /** Connected components of an undirected edge list (first two
    * columns = long endpoint ids) → (node, label = component-min id).
    * Large-star/small-star: O(log n) rounds at any graph diameter;
    * fails loudly if the round cap is hit. */
  def connectedComponents(edges: DataFrame): DataFrame =
    operators.ConnectedComponents.alternatingStar(edges)
}
