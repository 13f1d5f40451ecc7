package graft.streaming

import org.apache.spark.sql.types.StructType

import graft.sources.PruningPredicates

/** Driver-side FILE PRUNING for the DSv2 stream planners — the
  * predicate-pushdown seam of `graft-delta` / `graft-iceberg`.
  *
  * Spark 4 does not route `SupportsPushDownFilters` into
  * [[org.apache.spark.sql.connector.read.streaming.MicroBatchStream]]
  * scans (verified empirically: the V2 pushdown rule rewrites batch
  * `DataSourceV2Relation`s only), so a `.filter(...)` on a streaming
  * DataFrame is applied AFTER every planned file is read — a 100 TB
  * backfill stream with a partition predicate scans the whole
  * history. The `filter` OPTION is the explicit seam: the same SQL
  * predicate the query re-applies, decomposed by
  * [[graft.sources.PruningPredicates]] into prune-safe conjuncts and
  * checked per planned file against (a) the file's log/manifest
  * partition values (type-aware equality) and (b) its recorded
  * min/max long bounds (Delta `add.stats`, Iceberg manifest value
  * bounds).
  *
  * Superset contract (same as the batch `readFiltered`): pruning only
  * ever DROPS files provably disjoint from the predicate; the caller
  * still applies the exact `.filter(...)` on the stream output, so a
  * conservative miss costs a file read, never a wrong row. Offsets
  * are untouched — admission control and (version, index) bookkeeping
  * run over the UNPRUNED file lists, so exactly-once replay is
  * byte-identical with or without the option. */
private[graft] object StreamFilter {

  /** Per-query pruning state + the planned/pruned seam counters a
    * spec asserts on (reassigned per planInputPartitions call). */
  final class Pruner(schema: StructType,
                     eqs: Map[String, Any],
                     ranges: Seq[(String, Long, Long)]) {
    def keep(partitionValues: Map[String, String],
             bounds: Map[String, (Long, Long)]): Boolean =
      eqs.forall { case (c, v) =>
        // absent column / undecidable compare → cannot prove a miss
        partitionValues.get(c).forall(s =>
          schema.fields.find(_.name == c).flatMap(f =>
            PruningPredicates.eqMatches(f.dataType, s, v))
            .getOrElse(true))
      } && ranges.forall { case (c, lo, hi) =>
        bounds.get(c) match {
          case Some((mn, mx)) => mn <= hi && mx >= lo
          case None => true // no stats can never prove no match
        }
      }
  }

  /** Build the pruner from a `filter` option value (a SQL boolean
    * expression over the stream's columns). None (no option) prunes
    * nothing. Unparseable SQL fails loudly at query start — a typo'd
    * predicate silently pruning nothing would masquerade as a slow
    * stream. */
  def pruner(filterSql: Option[String],
             schema: StructType): Option[Pruner] =
    filterSql.map { sql =>
      val ex = PruningPredicates.extract(
        org.apache.spark.sql.functions.expr(sql))
      new Pruner(schema, ex.eqs, ex.longRanges)
    }

  /** Seam: (planned, kept) file counts per TABLE DIRECTORY, keyed by
    * the planned OFFSET RANGE — replanning the same batch (Spark
    * plans a micro-batch more than once per execution) overwrites
    * its entry instead of double-counting, while the batches of a
    * multi-batch (admission-capped) drain occupy distinct ranges and
    * SUM. Per-table keying means two concurrent streams over
    * different tables never clobber each other (the round-12 flaw:
    * process-global `lastPlanned`/`lastKept` were overwritten by
    * every source's every call, so q204's in-query gate could assert
    * another query's counters). Two concurrent streams over the SAME
    * table still share an entry — callers that gate on it (q204) run
    * one query per table, which the per-table reset makes
    * explicit. */
  /** Ranges kept LIVE per table before folding into the base sums —
    * bounds driver memory on a long-running stream (one entry per
    * micro-batch otherwise, unbounded over days of triggers).
    * Replanning only ever re-submits the CURRENT batch's range, so a
    * window this wide keeps the overwrite-not-double-count rule for
    * every range that can actually replan. */
  private val MaxLiveRanges = 1024

  private final class TableStats {
    private val ranges =
      new java.util.LinkedHashMap[String, (Long, Long)]()
    private var basePlanned = 0L
    private var baseKept = 0L
    def put(range: String, p: Long, k: Long): Unit = synchronized {
      ranges.put(range, (p, k))
      while (ranges.size > MaxLiveRanges) {
        val it = ranges.entrySet.iterator
        val e = it.next()
        basePlanned += e.getValue._1
        baseKept += e.getValue._2
        it.remove()
      }
    }
    def totals: (Long, Long) = synchronized {
      var p = basePlanned; var k = baseKept
      ranges.values.forEach { v => p += v._1; k += v._2 }
      (p, k)
    }
  }

  private val planStats = scala.collection.concurrent.TrieMap
    .empty[String, TableStats]

  /** Record one planInputPartitions call's counts for `table`'s
    * batch over `range` (any stable spelling of [start, end)). */
  private[graft] def record(table: String, range: String,
                            planned: Int, kept: Int): Unit =
    planStats.getOrElseUpdate(table, new TableStats)
      .put(range, planned.toLong, kept.toLong)

  /** Clear `table`'s counts (call before the drain being measured). */
  private[graft] def reset(table: String): Unit =
    planStats.remove(table): Unit

  /** (planned, kept) totals for `table` since its last reset, summed
    * over distinct batch ranges (evicted ranges persist in the base
    * sums); (-1, -1) when the table never planned. */
  private[graft] def statsFor(table: String): (Long, Long) =
    planStats.get(table).map(_.totals).getOrElse((-1L, -1L))
}
