package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** A named bundle of analytic queries plus their DuckDB oracle SQL.
  * `SparkEntry` concatenates all packs into the driver contract. */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  /** ANSI SQL equivalents runnable by DuckDB over the same parquet tables.
    * Keys must be a subset of `queries` keys; omissions downgrade that
    * query to a rows-only check. */
  def oracles: Map[String, String]
}

/** Shared helpers that keep Spark results bit-identical to the DuckDB
  * oracle (see SURVEY.md §7 "hard parts"):
  *
  *  - Floating-point SUM is order-dependent, and both engines aggregate in
  *    nondeterministic parallel order → any double-sum may differ in the
  *    last ulp between runs. We therefore cast to decimal BEFORE summing
  *    (exact, order-independent) and pin the result type with a final cast
  *    that both engines agree on.
  *  - Averages/ratios are computed as `exact_decimal_sum → double` divided
  *    by an exact count: double division of identical operands is
  *    deterministic and identical across engines.
  *  - Every query ends in a total ORDER BY over a unique key set so row
  *    order is reproducible.
  */
object OracleSafe {
  /** Exact order-independent SUM: cast to DECIMAL(18,s), sum, pin to
    * DECIMAL(38,s). SQL mirror:
    * `CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DECIMAL(38,s))`. */
  def decSum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DecimalType(38, scale))

  /** Deterministic mean as described above. SQL mirror:
    * `CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE) / COUNT(*)`. */
  def decAvg(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double") / count(lit(1))
}
