package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Contract spec over the SHIPPED testdata (TESTDATA.md) — the one suite
  * that reads `/root/testdata` instead of building synthetic frames.
  *
  * r4 post-mortem: the physical type of `events.ts` drifted from
  * TIMESTAMP(NANOS) to TIMESTAMP(MICROS) between rounds and broke every
  * event-time query, invisibly, because no spec ever opened the shipped
  * parquet. This suite fails `sbt test` on the next silent drift: it
  * pins each table's column set, the type *family* of every column the
  * queries depend on, and runs one smoke aggregation per table.
  */
class TestDataContractSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"
  private def shipped = new java.io.File(sfDir).isDirectory

  import graft.queries.Tables

  // expected column -> acceptable type families (drift INSIDE a family
  // is absorbed by the engine; drift ACROSS families must fail loudly)
  private val integral: Set[DataType] = Set(IntegerType, LongType)
  private val clock: Set[DataType] =
    Set(LongType, TimestampType, TimestampNTZType) // Tables.tsMicros domain
  // day-granularity columns tolerate DATE (every consumer uses
  // year/month/datediff/date_format — all DATE-compatible) but NOT a
  // raw epoch long, which those functions reject; events.ts stays on
  // the strict clock family (needs time-of-day, adapted by tsMicros)
  private val dayClock: Set[DataType] =
    Set(TimestampType, TimestampNTZType, DateType)

  private val contract: Map[String, Seq[(String, Set[DataType])]] = Map(
    "region" -> Seq("r_regionkey" -> integral, "r_name" -> Set(StringType)),
    "nation" -> Seq("n_nationkey" -> integral, "n_name" -> Set(StringType),
      "n_regionkey" -> integral),
    "customer" -> Seq("c_custkey" -> integral, "c_name" -> Set(StringType),
      "c_nationkey" -> integral, "c_acctbal" -> Set(DoubleType),
      "c_mktsegment" -> Set(StringType)),
    "supplier" -> Seq("s_suppkey" -> integral, "s_name" -> Set(StringType),
      "s_nationkey" -> integral, "s_acctbal" -> Set(DoubleType)),
    "part" -> Seq("p_partkey" -> integral, "p_name" -> Set(StringType),
      "p_brand" -> Set(StringType), "p_type" -> Set(StringType),
      "p_size" -> integral, "p_retailprice" -> Set(DoubleType)),
    "orders" -> Seq("o_orderkey" -> integral, "o_custkey" -> integral,
      "o_orderstatus" -> Set(StringType), "o_totalprice" -> Set(DoubleType),
      "o_orderdate" -> dayClock, "o_orderpriority" -> Set(StringType)),
    "lineitem" -> Seq("l_orderkey" -> integral, "l_partkey" -> integral,
      "l_suppkey" -> integral, "l_linenumber" -> integral,
      "l_quantity" -> Set(DoubleType), "l_extendedprice" -> Set(DoubleType),
      "l_discount" -> Set(DoubleType), "l_tax" -> Set(DoubleType),
      "l_returnflag" -> Set(StringType), "l_linestatus" -> Set(StringType),
      "l_shipdate" -> dayClock),
    "events" -> Seq("event_id" -> integral, "ts" -> clock,
      "user_id" -> integral, "event_type" -> Set(StringType),
      "value" -> Set(DoubleType), "props" -> Set(StringType)),
    "documents" -> Seq("doc_id" -> integral, "text" -> Set(StringType),
      "lang" -> Set(StringType), "source" -> Set(StringType),
      "n_chars" -> integral),
    "embeddings" -> Seq("vec_id" -> integral,
      "embedding" -> Set(ArrayType(FloatType), ArrayType(FloatType, false),
        ArrayType(DoubleType), ArrayType(DoubleType, false)),
      "label" -> integral)
  )

  test("every shipped table matches its column/type-family contract") {
    assume(shipped, s"$sfDir not present")
    for ((table, cols) <- contract) {
      val df = Tables.load(spark, sfDir, table)
      val actual = df.schema.fields.map(f => f.name -> f.dataType).toMap
      for ((name, families) <- cols) {
        assert(actual.contains(name), s"$table: missing column $name")
        assert(families.contains(actual(name)),
          s"$table.$name read as ${actual(name)} — outside the accepted " +
            s"family $families; queries relying on it will break. If the " +
            "testdata legitimately drifted, widen the family AND make the " +
            "engine adaptive (see Tables.tsMicros).")
      }
    }
  }

  test("events.ts resolves through Tables.tsMicros to plausible epoch-µs") {
    assume(shipped, s"$sfDir not present")
    val ev = Tables.eventsMicros(spark, sfDir)
    assert(ev.schema("ts_us").dataType === LongType)
    val row = ev.agg(min(col("ts_us")), max(col("ts_us")), count(lit(1)))
      .head()
    val (lo, hi, n) = (row.getLong(0), row.getLong(1), row.getLong(2))
    assert(n > 0, "events is empty")
    // 2000-01-01..2100-01-01 in epoch-µs: a nanos value misread as µs
    // (or µs misread as nanos) lands 1000× outside this band
    val y2000 = 946684800000000L
    val y2100 = 4102444800000000L
    assert(lo >= y2000 && hi < y2100,
      s"ts_us range [$lo, $hi] implausible — unit misinterpretation?")
  }

  test("one smoke aggregation per shipped table returns rows") {
    assume(shipped, s"$sfDir not present")
    for (table <- contract.keys) {
      val df = Tables.load(spark, sfDir, table)
      val n = df.count()
      assert(n > 0, s"$table is empty")
      // exercise a real scan + agg over the first contract column
      val c = contract(table).head._1
      val distinct = df.agg(countDistinct(col(c))).head().getLong(0)
      assert(distinct > 0, s"$table.$c has no values")
    }
  }

  test("event-time smoke: session windows build over the shipped clock") {
    assume(shipped, s"$sfDir not present")
    // the exact shape that broke in r4: timestamp_micros over ts_us
    val sessions = Tables.eventsMicros(spark, sfDir)
      .withColumn("t", timestamp_micros(col("ts_us")))
      .groupBy(session_window(col("t"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
    assert(sessions.count() > 0)
  }
}
