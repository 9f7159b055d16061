package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared basket-pair builder: distinct co-occurrence pairs (pa < pb)
  * with their basket counts, from raw (basket, item) rows.
  *
  * Replaces the former distinct → self-join-on-basket → pair-rollup
  * shape used by the co-purchase family (q120/q125, q122–q128 edge
  * lists, q186/q251 frequent pairs, q238): that plan cost THREE
  * exchanges (distinct on (o, p); re-partition on o for the self-join
  * — reused for both sides but still a full extra pass + sort under
  * sort-merge; final rollup on (pa, pb)) plus the join itself. This
  * form costs TWO: one aggregate keyed on the basket id that collapses
  * each basket to its sorted distinct item array (map-side-combined
  * ObjectHashAggregate — the shuffle carries per-partition partial
  * sets, bounded by basket size), then a narrow in-array pair
  * expansion (posexplode + slice — C(basket, 2) rows, the same fanout
  * the join produced), then the same (pa, pb) rollup. No sort, no
  * join, one fewer full exchange of the fact rows (guide §2.4
  * "remove shuffles outright").
  *
  * Equivalence (the oracles keep the join form, so the hash gate
  * checks this every run): collect_set ≡ DISTINCT within the basket;
  * sort_array ascending makes every in-array (i < j) pair satisfy
  * pa < pb exactly once; count per (pa, pb) = number of baskets
  * containing both — identical to the join's count. NULL basket ids
  * are filtered explicitly (the self-join's `o = o` never matched
  * NULLs); NULL items never pair in either form (collect_set drops
  * them; `pa < pb` rejects them).
  *
  * Scale shape: per-basket state is the basket's distinct item set —
  * bounded by basket size (the same bound the old join relied on for
  * its fanout), never by catalog or basket count; a pathological
  * mega-basket concentrates C(m, 2) pairs in one task under EITHER
  * form (the join keyed on the basket id put the same m² in one
  * bucket). */
object BasketPairs {

  /** (pa, pb, n) over distinct items per basket, pa < pb,
    * n = co-occurring basket count. */
  def apply(items: DataFrame, o: String, p: String): DataFrame = {
    val baskets = items.filter(col(o).isNotNull)
      .groupBy(col(o)).agg(sort_array(collect_set(col(p))).as("__ps"))
    baskets
      .select(col("__ps"), posexplode(col("__ps")).as(Seq("__i", "pa")))
      // items strictly after position __i (slice is 1-based; length
      // overshoot past the array end is allowed and clamped)
      .select(col("pa"), explode(
        slice(col("__ps"), col("__i") + lit(2), size(col("__ps")))).as("pb"))
      .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("n"))
  }

  /** The pre-round-14 self-join form, on an input that is ALREADY
    * distinct (and, at the call sites that use this, already
    * materialized): join-on-basket → pa < pb → (pa, pb) rollup.
    *
    * Kept alongside the aggregate form because the round-14 reroute of
    * EVERY caller through [[apply]] measurably regressed two paths
    * (r14 verdict #2): when the input rows are already checkpointed
    * distinct blocks, the self-join reuses them on both sides for one
    * repartition-by-basket, while the aggregate form pays an
    * ObjectHashAggregate that rebuilds per-basket sets plus
    * per-position array slicing — pure overhead on top of cached
    * input. Same (pa, pb, n) output: the join's `o = o` equi-key
    * never matches NULL baskets, `pa < pb` never passes NULL items,
    * and the input being distinct makes each co-occurring pair count
    * once per basket — the oracles keep this join form, so the hash
    * gate re-proves equivalence every run. */
  def viaJoinOfDistinct(distinctItems: DataFrame, o: String, p: String): DataFrame = {
    val a = distinctItems.select(col(o).as("__o"), col(p).as("pa"))
    val b = distinctItems.select(col(o).as("__o"), col(p).as("pb"))
    a.join(b, Seq("__o")).filter(col("pa") < col("pb"))
      .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("n"))
  }
}
