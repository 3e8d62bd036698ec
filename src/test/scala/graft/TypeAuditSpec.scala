package graft

import org.apache.spark.sql.types._

/** Registry-wide emitted-type audit (round-10 lesson): every query's
  * RESULT schema must stay inside the cross-engine-stable type set.
  * DecimalType in particular diverges between Spark's parquet result
  * path (exact decimal128) and DuckDB's dataframe path (degrades to
  * float64), so identical VALUES still hash-mismatch at the driver —
  * exactly how q_ts_changepoint and q_audit_expectations shipped red
  * in round 10. Decimals are internal-arithmetic only; the emit is
  * always BIGINT/DOUBLE/STRING/DATE/TIMESTAMP/BOOLEAN or arrays/
  * structs thereof. The DuckDB-side twin of this gate lives in
  * tools/check.py (fails any HUGEINT/DECIMAL oracle result column).
  */
class TypeAuditSpec extends SparkSuite {

  private def ok(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType   => true
    case FloatType | DoubleType                          => true
    case StringType | BooleanType | DateType             => true
    case TimestampType | TimestampNTZType                => true
    case BinaryType                                      => true
    case ArrayType(e, _)                                 => ok(e)
    case MapType(k, v, _)                                => ok(k) && ok(v)
    case StructType(fs)                                  =>
      fs.forall(f => ok(f.dataType))
    case _                                               => false
  }

  test("no query emits a decimal or otherwise engine-divergent column") {
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val schema = fn(spark, sf0).schema
        schema.fields.collect {
          case f if !ok(f.dataType) =>
            s"$name.${f.name}: ${f.dataType.sql}"
        }
    }
    assert(bad.isEmpty,
      s"engine-divergent emitted columns:\n${bad.mkString("\n")}")
  }
}
