package graft

import org.apache.spark.sql.types._

/** Structural gate for the driver-hash width class (rounds 7 and 10):
  * the driver's value hash cannot digest DECIMAL/HUGEINT terminals
  * symmetrically even when both engines emit identical bytes, so NO gate
  * row may expose one. Wide math stays internal (scaledDiv/varqDecimal);
  * terminals must be in the proven-hashable set. Only the returned
  * DataFrame's .schema is asserted (no .collect here), but constructing
  * the entries is NOT free — streaming rows drain eagerly and connector
  * rows seed stubs — so this runs at suite cost, not milliseconds; the
  * value is that every row's driver-facing schema is asserted in ONE
  * place.
  */
class TerminalTypeSpec extends SparkTestBase {

  private def allowed(dt: DataType): Boolean = dt match {
    case LongType | DoubleType | StringType | BooleanType |
         DateType | TimestampType | IntegerType => true
    case ArrayType(et, _) => allowed(et)
    case _ => false
  }

  test("every gate row's driver-facing terminal types are hashable") {
    val bad = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      val schema =
        try fn(spark, sf).schema
        catch { case e: Throwable =>
          fail(s"$name: schema analysis failed: ${e.getMessage}")
        }
      schema.fields.collect {
        case f if !allowed(f.dataType) => s"$name.${f.name}: ${f.dataType.sql}"
      }
    }
    assert(bad.isEmpty,
      s"banned terminal widths (emit BIGINT/DOUBLE/VARCHAR instead):\n  " +
        bad.mkString("\n  "))
  }
}
