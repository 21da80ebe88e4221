package graft

import org.apache.spark.sql.SparkSession

/** Verify-time rendering of fitted index artifacts into DuckDB SQL
  * literals — the mechanism that promotes the bounded-sample-fit queries
  * (q33b IVF, q78 PQ, q78b IVF-PQ, q95 SemDeDup) from rows-only checks
  * to full value/hash oracles. A `{TOKEN}` in a QuerySpec's oracle SQL is
  * replaced with VALUES rows when [[Verify]] dumps `oracle_sql.json`,
  * reading the SAME memoized fit ([[queries.Fits]]) the Spark query
  * consumed — see Fits' determinism note.
  *
  * Number formatting: `Double.toString` / `Float.toString` emit the
  * shortest round-trip decimal. DuckDB parses the text as DOUBLE — for
  * doubles the closest double IS the original value; for floats the
  * parsed double sits within a fraction of a float-ulp of the decimal,
  * which uniquely identifies the float, so the `::REAL[]` cast recovers
  * the exact float32 the Spark Column literals carry.
  */
object OracleLiterals {

  /** `cent(cell, cf, c2)`: cf = float32 centroid (the form the Column
    * expressions dot against), c2 = Σ c² in DOUBLE — the constant term of
    * the `-2·x·c + ‖c‖²` cell score, summed in array order exactly like
    * the Scala `c.map(v => v*v).sum` that built the Spark literal. */
  // bare numeric literals inside VALUES parse as DECIMAL in DuckDB — the
  // score arithmetic must run in DOUBLE/REAL, so every scalar is cast
  private def d(v: Double): String = s"CAST($v AS DOUBLE)"
  private def r(v: Float): String = s"CAST($v AS REAL)"

  private def centroidRows(centers: Array[Array[Double]]): String =
    centers.zipWithIndex.map { case (c, i) =>
      val cf = c.map(v => v.toFloat.toString).mkString("[", ", ", "]::REAL[]")
      s"($i, $cf, ${d(c.map(v => v * v).sum)})"
    }.mkString(",\n  ")

  /** `book(j, code, bf, b2d, b2f)`: bf = float32 codebook centroid of
    * subspace j, b2d = Σ c² DOUBLE (encode-side score constant), b2f =
    * float32(b2d) — the norm²-LUT entry `pq_adc` reads. */
  private def bookRows(books: Array[Array[Array[Double]]]): String =
    books.zipWithIndex.flatMap { case (codes, j) =>
      codes.zipWithIndex.map { case (c, code) =>
        val bf = c.map(v => v.toFloat.toString).mkString("[", ", ", "]::REAL[]")
        val b2d = c.map(v => v * v).sum
        s"($j, $code, $bf, ${d(b2d)}, ${r(b2d.toFloat)})"
      }
    }.mkString(",\n  ")

  private val tokens: Map[String, (SparkSession, String) => String] = Map(
    "CENT16_100K" ->
      ((s, d) => centroidRows(queries.Fits.ivfCentroids(s, d, 16, 100000))),
    "CENT16_2K" ->
      ((s, d) => centroidRows(queries.Fits.ivfCentroids(s, d, 16, 2000))),
    "BOOKS16_2K" ->
      ((s, d) => bookRows(queries.Fits.pqCodebooks(s, d, 16, 16, 2000))))

  /** Replace every known `{TOKEN}` occurring in `sql`; fits run lazily
    * (only for tokens actually present) and memoize process-wide. */
  def substitute(sql: String, spark: SparkSession, sfDir: String): String =
    tokens.foldLeft(sql) { case (acc, (tok, render)) =>
      if (acc.contains(s"{$tok}")) acc.replace(s"{$tok}", render(spark, sfDir))
      else acc
    }
}
