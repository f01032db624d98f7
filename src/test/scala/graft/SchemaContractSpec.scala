package graft

import org.apache.spark.sql.types._

/** Pins the physical-type contract between the driver-generated testdata
  * (TESTDATA.md) and the loaders in [[Tables]].
  *
  * The testdata has been regenerated between rounds with different physical
  * types (events.ts was TIMESTAMP(NANOS), then TIMESTAMP(MICROS)); when the
  * loader's assumptions drift from the files, the failure mode is dozens of
  * cryptic DATATYPE_MISMATCH errors scattered across unrelated suites. This
  * spec fails FIRST, with a readable per-column message, so a future swap
  * is diagnosed in one line instead of 25 red tests.
  */
class SchemaContractSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  /** Column type must be one of the accepted alternatives — i.e. every
    * physical encoding the loader is known to normalize correctly. */
  private def assertCols(table: String, df: org.apache.spark.sql.DataFrame,
                         contract: Map[String, Set[DataType]]): Unit = {
    val actual = df.schema.fields.map(f => f.name -> f.dataType).toMap
    contract.foreach { case (col, accepted) =>
      assert(actual.contains(col),
        s"$table: column '$col' missing from testdata (has: ${actual.keys.mkString(", ")})")
      assert(accepted.contains(actual(col)),
        s"$table.$col: testdata carries ${actual(col)} but the loader only handles " +
          s"${accepted.mkString(" | ")} — update Tables.scala AND this contract together")
    }
  }

  test("events: raw file ts is a type the loader normalizes; loaded ts is timestamp") {
    // Raw scan: the set of physical types Tables.events knows how to handle.
    val raw = spark.read.parquet(s"$dir/events.parquet")
    assertCols("events(raw)", raw, Map(
      "ts" -> Set[DataType](LongType, TimestampType, TimestampNTZType)))
    // Post-loader: everything downstream assumes session-TZ timestamp.
    val loaded = Tables.events(spark, dir)
    assert(loaded.schema("ts").dataType == TimestampType,
      s"Tables.events must normalize ts to TimestampType, got ${loaded.schema("ts").dataType}")
    assertCols("events", loaded, Map(
      "event_id"   -> Set[DataType](LongType),
      "user_id"    -> Set[DataType](LongType),
      "event_type" -> Set[DataType](StringType),
      "value"      -> Set[DataType](DoubleType),
      "props"      -> Set[DataType](StringType)))
  }

  test("lineitem / orders: numeric and date columns") {
    assertCols("lineitem", Tables.lineitem(spark, dir), Map(
      "l_orderkey"      -> Set[DataType](LongType),
      "l_partkey"       -> Set[DataType](LongType),
      "l_suppkey"       -> Set[DataType](LongType),
      "l_linenumber"    -> Set[DataType](IntegerType),
      "l_quantity"      -> Set[DataType](DoubleType, DecimalType(15, 2)),
      "l_extendedprice" -> Set[DataType](DoubleType, DecimalType(15, 2)),
      "l_discount"      -> Set[DataType](DoubleType, DecimalType(15, 2)),
      "l_tax"           -> Set[DataType](DoubleType, DecimalType(15, 2)),
      "l_returnflag"    -> Set[DataType](StringType),
      "l_linestatus"    -> Set[DataType](StringType),
      "l_shipdate"      -> Set[DataType](TimestampType, TimestampNTZType, DateType)))
    assertCols("orders", Tables.orders(spark, dir), Map(
      "o_orderkey"    -> Set[DataType](LongType),
      "o_custkey"     -> Set[DataType](LongType),
      "o_orderstatus" -> Set[DataType](StringType),
      "o_totalprice"  -> Set[DataType](DoubleType, DecimalType(15, 2)),
      "o_orderdate"   -> Set[DataType](TimestampType, TimestampNTZType, DateType)))
  }

  test("dimensions: region / nation / customer / supplier / part") {
    assertCols("region", Tables.region(spark, dir), Map(
      "r_regionkey" -> Set[DataType](IntegerType, LongType),
      "r_name"      -> Set[DataType](StringType)))
    assertCols("nation", Tables.nation(spark, dir), Map(
      "n_nationkey" -> Set[DataType](IntegerType, LongType),
      "n_name"      -> Set[DataType](StringType),
      "n_regionkey" -> Set[DataType](IntegerType, LongType)))
    assertCols("customer", Tables.customer(spark, dir), Map(
      "c_custkey"    -> Set[DataType](LongType),
      "c_nationkey"  -> Set[DataType](IntegerType, LongType),
      "c_acctbal"    -> Set[DataType](DoubleType, DecimalType(15, 2)),
      "c_mktsegment" -> Set[DataType](StringType)))
    assertCols("supplier", Tables.supplier(spark, dir), Map(
      "s_suppkey"   -> Set[DataType](LongType),
      "s_nationkey" -> Set[DataType](IntegerType, LongType),
      "s_acctbal"   -> Set[DataType](DoubleType, DecimalType(15, 2))))
    assertCols("part", Tables.part(spark, dir), Map(
      "p_partkey"     -> Set[DataType](LongType),
      "p_size"        -> Set[DataType](IntegerType, LongType),
      "p_retailprice" -> Set[DataType](DoubleType, DecimalType(15, 2))))
  }

  test("documents / embeddings: LLM-pipeline tables") {
    assertCols("documents", Tables.documents(spark, dir), Map(
      "doc_id"  -> Set[DataType](LongType),
      "text"    -> Set[DataType](StringType),
      "lang"    -> Set[DataType](StringType),
      "source"  -> Set[DataType](StringType),
      "n_chars" -> Set[DataType](LongType, IntegerType)))
    assertCols("embeddings", Tables.embeddings(spark, dir), Map(
      "vec_id" -> Set[DataType](LongType),
      // float is what the ANN expressions are codegen'd for; a silent swap
      // to double would double shuffle width and break PQ codebooks.
      "embedding" -> Set[DataType](ArrayType(FloatType, containsNull = true),
                                   ArrayType(FloatType, containsNull = false)),
      "label" -> Set[DataType](IntegerType, LongType)))
  }
}
