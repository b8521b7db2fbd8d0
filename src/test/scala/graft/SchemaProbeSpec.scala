package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/**
 * Probe the LIVE driver testdata against every dtype assumption the
 * engine makes, so a testdata regeneration with a changed schema fails
 * loudly in `sbt test` instead of silently erroring a swath of queries
 * at verify time (round 7 lost 16 queries to exactly such a drift:
 * events.ts moved from nano-precision INT64 to micro-precision
 * TIMESTAMP between rounds with zero in-repo signal).
 *
 * Two layers:
 *  1. raw-parquet columns the queries reference must exist with a dtype
 *     the engine handles (for ts: any of the three shapes the scan
 *     normalizer in [[Queries.t]] adapts to);
 *  2. the ENGINE-FACING invariant — after [[Queries.t]], events.ts is
 *     exact LongType microseconds-since-epoch matching DuckDB's
 *     epoch_us(ts) — asserted on values, not just types, via a spot
 *     row fetched through both the normalizer and a raw cast.
 */
class SchemaProbeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .appName("schema-probe")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** column -> dtypes the engine can consume for it */
  private val assumed: Map[String, Map[String, Set[DataType]]] = Map(
    "events" -> Map(
      "event_id" -> Set(LongType),
      // the three ts shapes Queries.t normalizes; anything else is a
      // NEW drift the normalizer must learn before queries can run
      "ts" -> Set(LongType, TimestampType, TimestampNTZType),
      "user_id" -> Set(LongType),
      "event_type" -> Set(StringType),
      "value" -> Set(DoubleType),
      "props" -> Set(StringType)),
    "documents" -> Map(
      "doc_id" -> Set(LongType),
      "text" -> Set(StringType),
      "lang" -> Set(StringType),
      "source" -> Set(StringType),
      "n_chars" -> Set(LongType)),
    "embeddings" -> Map(
      "vec_id" -> Set(LongType),
      "embedding" -> Set(ArrayType(FloatType), ArrayType(FloatType, false)),
      "label" -> Set(IntegerType)),
    "lineitem" -> Map(
      "l_orderkey" -> Set(LongType),
      "l_linenumber" -> Set(IntegerType),
      "l_quantity" -> Set(DoubleType),
      "l_extendedprice" -> Set(DoubleType),
      "l_discount" -> Set(DoubleType),
      "l_returnflag" -> Set(StringType)),
    "orders" -> Map(
      "o_orderkey" -> Set(LongType),
      "o_custkey" -> Set(LongType),
      "o_orderstatus" -> Set(StringType),
      "o_totalprice" -> Set(DoubleType)),
    "customer" -> Map(
      "c_custkey" -> Set(LongType),
      "c_nationkey" -> Set(IntegerType),
      "c_mktsegment" -> Set(StringType)),
    "supplier" -> Map(
      "s_suppkey" -> Set(LongType),
      "s_nationkey" -> Set(IntegerType),
      "s_acctbal" -> Set(DoubleType)),
    "nation" -> Map(
      "n_nationkey" -> Set(IntegerType),
      "n_name" -> Set(StringType),
      "n_regionkey" -> Set(IntegerType)),
    "region" -> Map(
      "r_regionkey" -> Set(IntegerType),
      "r_name" -> Set(StringType)),
    "part" -> Map(
      "p_partkey" -> Set(LongType),
      "p_brand" -> Set(StringType),
      "p_retailprice" -> Set(DoubleType)))

  test("live testdata columns match every dtype the engine assumes") {
    val drifts = for {
      (table, cols) <- assumed.toSeq
      schema = spark.read.parquet(s"$sf/$table.parquet").schema
      (colName, okTypes) <- cols.toSeq
      actual = schema.fields.find(_.name == colName).map(_.dataType)
      bad <- actual match {
        case None => Some(s"$table.$colName: MISSING (engine reads it)")
        case Some(dt) if !okTypes.contains(dt) =>
          Some(s"$table.$colName: $dt not in accepted ${okTypes.mkString("{", ", ", "}")}")
        case _ => None
      }
    } yield bad
    assert(drifts.isEmpty,
      s"\nTESTDATA SCHEMA DRIFT — adapt Queries.t / the affected queries:\n  ${drifts.mkString("\n  ")}")
  }

  test("normalized events.ts is LongType epoch-micros agreeing with a raw UTC cast") {
    val norm = Queries.t(spark, sf, "events")
    assert(norm.schema("ts").dataType == LongType,
      s"Queries.t must normalize ts to LongType micros, got ${norm.schema("ts").dataType}")
    // value-level check on a deterministic row: the normalizer's output
    // equals DuckDB-epoch_us semantics (UTC instant in whole micros)
    import org.apache.spark.sql.functions._
    val raw = spark.read.parquet(s"$sf/events.parquet")
    val expected = raw.schema("ts").dataType match {
      case LongType => raw.select(col("event_id"), expr("ts div 1000").as("us"))
      case TimestampNTZType =>
        raw.select(col("event_id"), unix_micros(col("ts").cast(TimestampType)).as("us"))
      case _ => raw.select(col("event_id"), unix_micros(col("ts")).as("us"))
    }
    val a = norm.orderBy("event_id").select("event_id", "ts").limit(5).collect()
    val b = expected.orderBy("event_id").limit(5).collect()
    assert(a.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      b.map(r => (r.getLong(0), r.getLong(1))).toSeq)
    // sanity: the values are plausible epoch-micros (year > 2000), i.e.
    // nobody silently fed seconds or nanos through the normalized column
    val ts0 = a.head.getLong(1)
    assert(ts0 > 946684800000000L && ts0 < 4102444800000000L,
      s"normalized ts $ts0 is not in the plausible epoch-microsecond range")
  }

  test("embeddings.vec_id is contiguous 0..N-1 (q158's modular negative-draw contract)") {
    // q158 derives neg_id = pmod(anchor + 1 + h % (n-1), n): a gap-ful
    // id space would silently draw nonexistent negatives (dropped by
    // the inner join -> fewer than kNeg negatives per anchor). Probe the
    // LIVE table so a regenerated testdata fails loudly (r10 verdict #4).
    import org.apache.spark.sql.functions._
    val ids = spark.read.parquet(s"$sf/embeddings.parquet")
      .agg(min("vec_id").as("mn"), max("vec_id").as("mx"),
        countDistinct("vec_id").as("nd"), count(lit(1)).as("n")).collect()(0)
    assert(ids.getLong(0) == 0L, s"min vec_id ${ids.getLong(0)} != 0")
    assert(ids.getLong(1) == ids.getLong(3) - 1,
      s"max vec_id ${ids.getLong(1)} != count-1 ${ids.getLong(3) - 1}")
    assert(ids.getLong(2) == ids.getLong(3), "vec_id not unique")
  }
}
