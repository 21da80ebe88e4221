package graft

import org.apache.spark.sql.types._

/** Pins the driver-generated testdata schemas the engine depends on.
  *
  * The driver has regenerated `/root/testdata` between rounds at least once
  * (round 7: `events.ts` changed from nanosecond-int64 parquet to native
  * `timestamp[us]`, silently breaking 28 oracle queries). This spec turns any
  * future reshape into a one-line diagnosis: each table's decoded Spark schema
  * is checked column-by-column against the engine's expectations, and a failure
  * names the exact drifted column and the observed vs accepted types.
  *
  * Temporal columns accept the set of physical generations the loaders adapt
  * to (see [[Tables.events]]): int64 nanos (legacy mode), `TIMESTAMP_NTZ`
  * (µs parquet with isAdjustedToUTC=false — the pandas default), or session-TZ
  * `TIMESTAMP`.
  */
class TestdataSchemaSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Accepted decoded types per column. A Seq means "any of these"; temporal
    * columns list every generation the engine's readers handle. */
  private val temporal: Seq[DataType] =
    Seq(LongType, TimestampNTZType, TimestampType, DateType)

  private val expected: Map[String, Seq[(String, Seq[DataType])]] = Map(
    "region" -> Seq(
      "r_regionkey" -> Seq(IntegerType, LongType),
      "r_name" -> Seq(StringType)),
    "nation" -> Seq(
      "n_nationkey" -> Seq(IntegerType, LongType),
      "n_name" -> Seq(StringType),
      "n_regionkey" -> Seq(IntegerType, LongType)),
    "customer" -> Seq(
      "c_custkey" -> Seq(LongType),
      "c_name" -> Seq(StringType),
      "c_nationkey" -> Seq(IntegerType, LongType),
      "c_acctbal" -> Seq(DoubleType),
      "c_mktsegment" -> Seq(StringType)),
    "supplier" -> Seq(
      "s_suppkey" -> Seq(LongType),
      "s_name" -> Seq(StringType),
      "s_nationkey" -> Seq(IntegerType, LongType),
      "s_acctbal" -> Seq(DoubleType)),
    "part" -> Seq(
      "p_partkey" -> Seq(LongType),
      "p_name" -> Seq(StringType),
      "p_brand" -> Seq(StringType),
      "p_type" -> Seq(StringType),
      "p_size" -> Seq(IntegerType, LongType),
      "p_retailprice" -> Seq(DoubleType)),
    "orders" -> Seq(
      "o_orderkey" -> Seq(LongType),
      "o_custkey" -> Seq(LongType),
      "o_orderstatus" -> Seq(StringType),
      "o_totalprice" -> Seq(DoubleType),
      "o_orderdate" -> temporal,
      "o_orderpriority" -> Seq(StringType)),
    "lineitem" -> Seq(
      "l_orderkey" -> Seq(LongType),
      "l_partkey" -> Seq(LongType),
      "l_suppkey" -> Seq(LongType),
      "l_linenumber" -> Seq(IntegerType, LongType),
      "l_quantity" -> Seq(DoubleType),
      "l_extendedprice" -> Seq(DoubleType),
      "l_discount" -> Seq(DoubleType),
      "l_tax" -> Seq(DoubleType),
      "l_returnflag" -> Seq(StringType),
      "l_linestatus" -> Seq(StringType),
      "l_shipdate" -> temporal),
    "events" -> Seq(
      "event_id" -> Seq(LongType),
      "ts" -> temporal,
      "user_id" -> Seq(LongType),
      "event_type" -> Seq(StringType),
      "value" -> Seq(DoubleType),
      "props" -> Seq(StringType)),
    "documents" -> Seq(
      "doc_id" -> Seq(LongType),
      "text" -> Seq(StringType),
      "lang" -> Seq(StringType),
      "source" -> Seq(StringType),
      "n_chars" -> Seq(LongType, IntegerType)),
    "embeddings" -> Seq(
      "vec_id" -> Seq(LongType),
      "embedding" -> Seq(ArrayType(FloatType), ArrayType(FloatType, false),
        ArrayType(DoubleType), ArrayType(DoubleType, false)),
      "label" -> Seq(IntegerType, LongType))
  )

  for ((name, cols) <- expected.toSeq.sortBy(_._1))
    test(s"testdata schema pin: $name") {
      // raw decode, not the adapting loader — this is the drift detector
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val schema = spark.read.parquet(s"$sf/$name.parquet").schema
      val byName = schema.fields.map(f => f.name -> f.dataType).toMap
      val missing = cols.map(_._1).filterNot(byName.contains)
      assert(missing.isEmpty,
        s"DRIFT in $name.parquet: missing column(s) ${missing.mkString(", ")}; " +
          s"observed schema ${schema.simpleString}")
      for ((col, accepted) <- cols) {
        val got = byName(col)
        // ignore containsNull mismatch for arrays — both decodes are handled
        val ok = accepted.exists {
          case ArrayType(et, _) => got match {
            case ArrayType(gt, _) => gt == et
            case _ => false
          }
          case t => t == got
        }
        assert(ok,
          s"DRIFT in $name.parquet column `$col`: decoded as $got, engine " +
            s"accepts ${accepted.mkString(" | ")} — update the adapting " +
            "loader in Tables.scala (see Tables.events for the pattern)")
      }
    }

  test("events loader adapts every accepted ts generation to TimestampType") {
    val df = Tables.events(spark, sf)
    assert(df.schema("ts").dataType === TimestampType,
      s"Tables.events must surface session-TZ TIMESTAMP; got " +
        df.schema("ts").dataType)
    assert(df.select("ts").na.drop().count() > 0)
  }

  test("deliberate drift: events loader rejects an unsupported ts type") {
    import spark.implicits._
    val dir = tmpDir("drifted-events")
    Seq((1L, "not-a-timestamp", 2L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException] { Tables.events(spark, dir) }
    assert(e.getMessage.contains("schema drift"),
      s"drift error should name the cause; got: ${e.getMessage}")
  }
}
