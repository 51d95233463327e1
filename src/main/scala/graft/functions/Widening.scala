package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Executable form of SURVEY.md §1.2's type-widening conventions: the
  * reference's Arrow wire types with no exact Spark equivalent (reference:
  * rust/core/proto/ballista.proto:750-785, converted in
  * rust/core/src/serde/logical_plan/from_proto.rs:319-429) map to the
  * nearest strictly-wider Spark type via these column transforms. Each
  * helper takes the value as Spark ingests it (raw two's-complement bits
  * for the unsigned family, IEEE bit pattern for FLOAT16) and produces the
  * widened, value-preserving representation.
  *
  * | reference wire type | carrier column        | helper       | result |
  * |---------------------|-----------------------|--------------|--------|
  * | UINT8               | ByteType (raw bits)   | [[uint8]]    | ShortType, [0, 255] |
  * | UINT16              | ShortType (raw bits)  | [[uint16]]   | IntegerType, [0, 65535] |
  * | UINT32              | IntegerType (raw bits)| [[uint32]]   | LongType, [0, 2^32) |
  * | UINT64              | LongType (raw bits)   | [[uint64]]   | DecimalType(20,0), [0, 2^64) |
  * | FLOAT16             | ShortType (IEEE bits) | [[float16]]  | FloatType (exact: every half is a float) |
  * | TIME32 {s, ms}      | IntegerType           | [[timeToMicros]] | LongType µs-of-day |
  * | TIME64 {us, ns}     | LongType              | [[timeToMicros]] | LongType µs-of-day (ns truncates) |
  * | DURATION (µs)       | LongType              | [[durationMicros]] | DayTimeIntervalType |
  * | UNION {tag, branches} | tag + branch columns | [[unionAsStruct]] | StructType of nullables |
  */
object Widening {

  /** UINT8 stored as a signed byte → ShortType in [0, 255]. */
  def uint8(c: Column): Column =
    c.cast(IntegerType).bitwiseAND(lit(0xFF)).cast(ShortType)

  /** UINT16 stored as a signed short → IntegerType in [0, 65535]. */
  def uint16(c: Column): Column =
    c.cast(IntegerType).bitwiseAND(lit(0xFFFF))

  /** UINT32 stored as a signed int → LongType in [0, 2^32). */
  def uint32(c: Column): Column =
    c.cast(LongType).bitwiseAND(lit(0xFFFFFFFFL))

  private val TwoPow64 = BigDecimal("18446744073709551616")

  /** UINT64 stored as a signed long → DecimalType(20,0) in [0, 2^64). */
  def uint64(c: Column): Column =
    when(c >= 0, c.cast(DecimalType(20, 0)))
      .otherwise((c.cast(DecimalType(20, 0)) + lit(TwoPow64)).cast(DecimalType(20, 0)))

  /** FLOAT16 IEEE 754 bit pattern (in a ShortType) → FloatType. Every
    * half-precision value (normal, subnormal, ±0, ±Inf, NaN) is exactly
    * representable as a float, so this widening is lossless.
    */
  def float16(c: Column): Column = {
    val bits = c.cast(IntegerType).bitwiseAND(lit(0xFFFF))
    val sign = when(bits.bitwiseAND(lit(0x8000)) =!= 0, lit(-1.0d)).otherwise(lit(1.0d))
    val e = shiftright(bits, 10).bitwiseAND(lit(0x1F))
    val f = bits.bitwiseAND(lit(0x3FF)).cast(DoubleType)
    val mag = when(e === 0, f * lit(math.pow(2, -24)))             // subnormal / zero
      .when(e === 31 && f === 0.0, lit(Double.PositiveInfinity))   // infinity
      .when(e === 31, lit(Double.NaN))                             // NaN
      .otherwise((lit(1.0) + f / lit(1024.0)) *
        pow(lit(2.0), (e - lit(15)).cast(DoubleType)))             // normal
    (sign * mag).cast(FloatType)
  }

  /** TIME32/TIME64 time-of-day in the wire unit → LongType µs-of-day.
    * The reference's ns unit truncates toward zero, matching the µs-native
    * convention documented for TIMESTAMP in SURVEY.md §1.2.
    */
  def timeToMicros(c: Column, unit: String): Column = unit match {
    case "s"  => c.cast(LongType) * lit(1000000L)
    case "ms" => c.cast(LongType) * lit(1000L)
    case "us" => c.cast(LongType)
    case "ns" => (c.cast(LongType) / lit(1000L)).cast(LongType)
    case other => throw new IllegalArgumentException(
      s"unsupported time unit '$other' (expected s/ms/us/ns)")
  }

  /** DURATION in µs → DayTimeIntervalType (µs precision preserved:
    * make_dt_interval's seconds argument accepts fractional seconds).
    */
  def durationMicros(c: Column): Column =
    make_dt_interval(lit(0), lit(0), lit(0),
      c.cast(DecimalType(26, 6)) / lit(BigDecimal(1000000)))

  /** UNION {tag, branches} → struct of nullables: the tag plus one field
    * per branch, non-null only where the tag selects that branch — the
    * §1.2 "struct-of-nullables" encoding.
    */
  def unionAsStruct(tag: Column, branches: Seq[(Int, String, Column)]): Column =
    struct((tag.as("tag") +: branches.map { case (id, name, v) =>
      when(tag === lit(id), v).as(name)
    }): _*)
}
