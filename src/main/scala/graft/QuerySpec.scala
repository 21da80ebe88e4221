package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One judged query: a Spark program plus (when SQL-expressible) the
  * equivalent DuckDB oracle SQL the driver hash-compares against.
  *
  * Oracle-parity rules (driver sorts columns by name, then hashes values):
  *  - alias every computed column identically on both sides;
  *  - never emit a raw double that came out of an order-dependent aggregate:
  *    route sums through exact DECIMAL arithmetic, then cast the final value
  *    back to DOUBLE on both sides (decimal addition is associative, so the
  *    result is bit-identical regardless of partitioning/parallelism);
  *  - derived integers (month, row_number, counts…) are BIGINT on both sides
  *    (DuckDB's date-part/window functions return BIGINT natively);
  *  - pin row order with a unique ORDER BY on both sides;
  *  - Spark ASC sorts NULLS FIRST, DuckDB NULLS LAST — pin `NULLS FIRST`
  *    explicitly in oracle SQL whenever a sort key is nullable.
  */
final case class QuerySpec(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** headline queries are what Bench times per round */
    headline: Boolean = false)
