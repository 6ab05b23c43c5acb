package graft

import org.apache.spark.sql.types.{ArrayType, DataType, DecimalType, MapType, StructType}

/** Output-shape lint for every oracle'd query (SURVEY §7.4).
  *
  * The driver's comparator materializes DuckDB DECIMAL results as
  * float64 while Spark parquet keeps Decimal objects — any decimal
  * value with a trailing zero hash-mismatches — and array/map cells
  * crash its pandas sort outright. So an oracle'd query must present
  * only scalar, non-decimal output columns; internal arithmetic stays
  * DECIMAL, the final projection casts to DOUBLE (operators.dbl).
  */
class OracleShapeSpec extends SparkSpec {

  private def hostile(dt: DataType): Boolean = dt match {
    case _: DecimalType => true
    case _: ArrayType   => true
    case _: MapType     => true
    case _: StructType  => true
    case _              => false
  }

  test("no oracle'd query emits decimal/array/map/struct output columns") {
    val offenders = SparkEntry.oracleSql.keys.toSeq.sorted.flatMap { name =>
      val schema = SparkEntry.queries(name)(spark, sf).schema
      schema.fields.collect {
        case f if hostile(f.dataType) => s"$name.${f.name}: ${f.dataType.simpleString}"
      }
    }
    assert(offenders.isEmpty,
      s"driver-hostile output columns in oracle'd queries:\n  ${offenders.mkString("\n  ")}")
  }

  test("every oracle'd key has a query and every query key is declared") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle SQL without a query: $missing")
  }
}
