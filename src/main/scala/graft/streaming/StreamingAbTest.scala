package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.operators.Behavior.abTest]] (q189): the
  * live experiment monitor. Per-unit `flatMapGroupsWithState` tracks
  * (variant, converted) and emits COUNTER DELTAS — +1 unit on first
  * sight, +1 conversion on the unit's false→true transition — so any
  * downstream sum over any prefix, in any delivery order, reproduces
  * the batch test's exact (n, conv) counters per variant (the z/χ²
  * statistic is a pure function of those four integers).
  *
  * Why deltas and not running totals: totals per variant would need a
  * second stateful aggregation level (unsupported downstream of
  * flatMapGroupsWithState in one query) — deltas are associative/
  * commutative, so the consumer (memory sink, foreachBatch upsert,
  * a metrics store) sums them with no ordering contract, the
  * StreamingUpsert convergence discipline.
  *
  * A unit observed under BOTH variants — the condition the batch
  * operator refuses loudly — surfaces here as a `mixed = true` delta
  * (zero counter weight) the moment the second variant arrives, so a
  * monitor can alert on assignment contamination mid-experiment
  * instead of discovering it at readout time. A mixed unit's
  * counters stay frozen at its FIRST variant (already-emitted deltas
  * are never retracted; the batch operator would have refused the
  * whole readout).
  *
  * State is ONE row per unit — key-space-bounded however long the
  * experiment runs.
  */
object StreamingAbTest {

  case class Exposure(unit: Long, variant: Long, converted: Boolean)

  case class UnitState(variant: Long, converted: Boolean, mixed: Boolean)

  /** `dN`/`dConv` sum to the batch counters; `mixed` rows carry zero
    * counter weight and flag contamination (unit, offending variant).
    */
  case class UnitDelta(unit: Long, variant: Long, dN: Long, dConv: Long,
      mixed: Boolean)

  def deltas(exposures: Dataset[Exposure])(
      implicit spark: SparkSession): Dataset[UnitDelta] = {
    import spark.implicits._
    exposures
      .groupByKey(_.unit)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout) {
        (unit: Long, it: Iterator[Exposure], state: GroupState[UnitState]) =>
          var st = state.getOption
          val out = scala.collection.mutable.ListBuffer.empty[UnitDelta]
          it.foreach { e =>
            st match {
              case None =>
                st = Some(UnitState(e.variant, e.converted, mixed = false))
                out += UnitDelta(unit, e.variant, 1L,
                  if (e.converted) 1L else 0L, mixed = false)
              case Some(s) if e.variant != s.variant =>
                // contamination: flag ONCE, freeze counters
                if (!s.mixed) {
                  st = Some(s.copy(mixed = true))
                  out += UnitDelta(unit, e.variant, 0L, 0L, mixed = true)
                }
              case Some(s) =>
                if (e.converted && !s.converted && !s.mixed) {
                  st = Some(s.copy(converted = true))
                  out += UnitDelta(unit, s.variant, 0L, 1L, mixed = false)
                }
            }
          }
          st.foreach(state.update)
          out.iterator
      }
  }
}
