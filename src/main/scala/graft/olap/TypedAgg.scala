package graft.olap

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Dataset surface: case-class rows + a custom `Aggregator` — the
  * `Dataset[T]`/`Encoder` half of the API (everything else in the engine is
  * untyped `DataFrame`, where schema is dynamic). The aggregator keeps the
  * engine's exactness contract: money accumulates as integer cents, so the
  * buffer is mergeable in any order and the typed path is bitwise-equal to
  * the SQL formulation.
  *
  * Scale posture: `Aggregator` compiles to a TypedAggregateExpression with
  * full partial aggregation (map-side combine), so the shuffle carries one
  * buffer per key. The cost of the typed path is per-row
  * deserialization into the case class and the loss of expression codegen
  * for the lambda — which is why it's ONE demonstrated query, with the
  * input columns pruned by an explicit select before the `.as[T]`.
  */
object TypedAgg {

  case class LiRow(l_returnflag: String, l_linestatus: String,
                   l_quantity: Double, l_extendedprice: Double)

  case class FlagStats(n_items: Long, qty_cents: Long, price_cents: Long)

  /** Exact per-key tallies: count, quantity cents, price cents. */
  val flagStats: Aggregator[LiRow, FlagStats, FlagStats] =
    new Aggregator[LiRow, FlagStats, FlagStats] {
      override def zero: FlagStats = FlagStats(0L, 0L, 0L)
      override def reduce(b: FlagStats, a: LiRow): FlagStats =
        FlagStats(b.n_items + 1,
          b.qty_cents + math.round(a.l_quantity * 100),
          b.price_cents + math.round(a.l_extendedprice * 100))
      override def merge(x: FlagStats, y: FlagStats): FlagStats =
        FlagStats(x.n_items + y.n_items, x.qty_cents + y.qty_cents,
          x.price_cents + y.price_cents)
      override def finish(r: FlagStats): FlagStats = r
      override def bufferEncoder: Encoder[FlagStats] =
        Encoders.product[FlagStats]
      override def outputEncoder: Encoder[FlagStats] =
        Encoders.product[FlagStats]
    }
}
