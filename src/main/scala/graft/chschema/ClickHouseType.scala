package graft.chschema

import org.apache.spark.sql.types._

/**
 * ClickHouse scalar type ADT, mirroring the reference's `ClickhouseType`
 * enum (reference: src/parquetutils.rs:66-74) plus an extended surface for
 * types the reference panics on (src/parquetutils.rs:85,96).
 *
 * Rendering uses `name`, which matches the Rust `{:?}` Debug format the
 * reference interpolates into DDL (src/parquetutils.rs:148-171).
 */
sealed abstract class ClickHouseType(val name: String)

object ClickHouseType {
  case object Bool extends ClickHouseType("Bool")
  case object Int8 extends ClickHouseType("Int8")
  case object Int16 extends ClickHouseType("Int16")
  case object Int32 extends ClickHouseType("Int32")
  case object Int64 extends ClickHouseType("Int64")
  case object Float32 extends ClickHouseType("Float32")
  case object Float64 extends ClickHouseType("Float64")
  case object CHString extends ClickHouseType("String")
  case object CHDate extends ClickHouseType("Date")
  final case class DateTime64(precision: Int)
      extends ClickHouseType(s"DateTime64($precision)")
  final case class CHDecimal(p: Int, s: Int)
      extends ClickHouseType(s"Decimal($p, $s)")

  /** Rendering mode (SURVEY.md §1.4 decision log).
   *
   * Legacy byte-matches the reference:
   *  - DATE → Int32, TIMESTAMP → Int64 (lossy; src/parquetutils.rs:94-95)
   *  - unsupported types raise a typed error instead of the reference's
   *    `unimplemented!()` panic (src/parquetutils.rs:85,96)
   * Extended maps losslessly (Date, DateTime64, Decimal, small ints).
   */
  sealed trait Mode
  case object Legacy extends Mode
  case object Extended extends Mode

  final case class UnsupportedType(dt: DataType, mode: Mode)
      extends IllegalArgumentException({
        val base = s"no ClickHouse mapping for Spark type ${dt.simpleString} in $mode mode"
        // a Legacy-mode user hitting a Decimal/Byte/Short/… column should
        // learn the escape hatch, not just the failure
        val extendedHasIt = mode == Legacy &&
          (try { fromSpark(dt, Extended); true }
           catch { case _: IllegalArgumentException => false })
        if (extendedHasIt) s"$base (this type maps losslessly in extended mode: pass --mode extended)"
        else base
      })

  /**
   * Scalar mapping from Spark's logical DataType. Spark has already
   * collapsed the reference's physical/converted duality
   * (src/parquetutils.rs:129-139) into one logical type, so this single
   * function covers both R5 and R6 of the reference inventory
   * (src/parquetutils.rs:76-99).
   */
  def fromSpark(dt: DataType, mode: Mode): ClickHouseType = (dt, mode) match {
    case (BooleanType, _)             => Bool
    case (IntegerType, _)             => Int32
    case (LongType, _)                => Int64
    case (FloatType, _)               => Float32
    case (DoubleType, _)              => Float64
    case (StringType, _)              => CHString
    case (BinaryType, _)              => CHString
    // reference: DATE → Int32, TIMESTAMP_MILLIS → Int64 (src/parquetutils.rs:94-95).
    // Spark reads Parquet timestamps with isAdjustedToUTC=false as
    // TimestampNTZType; both flavors carry the same converted type the
    // reference maps, so both get the same treatment.
    case (DateType, Legacy)           => Int32
    case (TimestampType, Legacy)      => Int64
    case (TimestampNTZType, Legacy)   => Int64
    case (DateType, Extended)         => CHDate
    case (TimestampType, Extended)    => DateTime64(6)
    case (TimestampNTZType, Extended) => DateTime64(6)
    case (ByteType, Extended)         => Int8
    case (ShortType, Extended)        => Int16
    case (d: DecimalType, Extended)   => CHDecimal(d.precision, d.scale)
    case _                            => throw UnsupportedType(dt, mode)
  }
}
