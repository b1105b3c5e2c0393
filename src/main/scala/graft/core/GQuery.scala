package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One declared engine query: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) the equivalent DuckDB oracle
  * SQL the driver's correctness gate replays on the same parquet
  * tables. `oracle = None` → the driver records a weaker rows-only
  * check (used for the probabilistic/hash-seeded operators whose
  * exact output no other engine can reproduce).
  */
final case class GQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** Part of the Bench headline set (scale-safe at sf0.1+). */
    bench: Boolean = true)

object QueryUtils {
  /** double → DECIMAL(28,10), value-identical to `.cast` (proven by
    * DecimalFastSpec) but ~2× cheaper per value and producing
    * compact-long-backed decimals the Sum fast path can add without
    * BigDecimal. This cast runs once per aggregated VALUE, so it is
    * the hottest scalar in every dsum/davg consumer. */
  def dec(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.{ColumnBridge, FastDoubleToDecimal}
    ColumnBridge.column(FastDoubleToDecimal(ColumnBridge.expression(c)))
  }

  /** Exact decimal sum of a double expression, surfaced as double.
    * Summing doubles directly is order-dependent (shuffle/partition
    * order differs run to run and engine to engine); summing after a
    * cast to DECIMAL(28,10) is exact and associative, so Spark and the
    * DuckDB oracle agree bit-for-bit no matter the plan. The final
    * round() guards the decimal→double conversion ulp. */
  def dsum(c: Column): Column =
    round(sum(dec(c)).cast("double"), 4)

  /** Deterministic mean: exact decimal sum over exact long count. */
  def davg(c: Column): Column =
    round(sum(dec(c)).cast("double") / count(lit(1)), 6)

  /** The same casts, spelled for the DuckDB oracle. */
  def sqlDsum(e: String): String =
    s"round(sum(($e)::DECIMAL(28,10))::DOUBLE, 4)"
  def sqlDavg(e: String): String =
    s"round(sum(($e)::DECIMAL(28,10))::DOUBLE / count(*), 6)"
}
