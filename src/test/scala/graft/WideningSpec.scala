package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Widening

/** Round-trips for the §1.2 type-widening conventions (SURVEY.md; wire
  * types at reference rust/core/proto/ballista.proto:750-785): every
  * unsigned value in the reference's domain must survive
  * raw-bits → widened Spark value → raw-bits unchanged, and FLOAT16
  * decoding must match the IEEE 754 half-precision golden values.
  */
class WideningSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("uint8: all 256 bit patterns widen to [0,255] and round-trip") {
    val rows = (0 until 256).map(i => Tuple1(i.toByte)).toDF("b")
      .select(col("b"), Widening.uint8(col("b")).as("u"))
      .collect()
    assert(rows.length == 256)
    rows.foreach { r =>
      val b = r.getByte(0); val u = r.getShort(1)
      assert(u >= 0 && u <= 255, s"out of range: $u")
      assert(u == (b & 0xFF), s"bits mismatch for $b")
      assert(u.toByte == b, "round-trip failed")
    }
    assert(rows.head.schema("u").dataType == ShortType)
  }

  test("uint16/uint32 widen boundary patterns correctly") {
    val r = Seq(((-1).toShort, -1, 0.toShort, 0), (Short.MinValue, Int.MinValue,
        Short.MaxValue, Int.MaxValue))
      .toDF("s1", "i1", "s2", "i2")
      .select(Widening.uint16(col("s1")).as("u16max"),
              Widening.uint32(col("i1")).as("u32max"),
              Widening.uint16(col("s2")).as("u16"),
              Widening.uint32(col("i2")).as("u32"))
      .collect()
    assert(r(0).getInt(0) == 65535 && r(0).getLong(1) == 4294967295L)
    assert(r(0).getInt(2) == 0 && r(0).getLong(3) == 0L)
    assert(r(1).getInt(0) == 32768 && r(1).getLong(1) == 2147483648L)
    assert(r(1).getInt(2) == 32767 && r(1).getLong(3) == 2147483647L)
  }

  test("uint64: widens to Decimal(20,0) across the full 2^64 domain") {
    val df = Seq(0L, 1L, Long.MaxValue, Long.MinValue, -1L).toDF("l")
      .select(col("l"), Widening.uint64(col("l")).as("u"))
    assert(df.schema("u").dataType == DecimalType(20, 0))
    val got = df.collect().map(r => r.getLong(0) -> r.getDecimal(1).toBigInteger).toMap
    assert(got(0L) == BigInt(0).bigInteger)
    assert(got(1L) == BigInt(1).bigInteger)
    assert(got(Long.MaxValue) == BigInt("9223372036854775807").bigInteger)
    assert(got(Long.MinValue) == BigInt("9223372036854775808").bigInteger)
    assert(got(-1L) == BigInt("18446744073709551615").bigInteger)
  }

  test("float16: IEEE 754 half golden values incl. subnormal/inf/nan") {
    // golden pairs (bit pattern, exact float value) from the IEEE 754-2008
    // binary16 definition
    val golden = Seq(
      0x0000 -> 0.0f,
      0x8000 -> -0.0f,
      0x3C00 -> 1.0f,
      0xC000 -> -2.0f,
      0x7BFF -> 65504.0f,              // largest normal
      0x0400 -> 6.103515625e-5f,       // smallest normal 2^-14
      0x0001 -> 5.9604644775390625e-8f, // smallest subnormal 2^-24
      0x03FF -> 6.097555160522461e-5f, // largest subnormal
      0x3555 -> 0.333251953125f        // ~1/3
    )
    val rows = golden.map { case (bits, _) => Tuple1(bits.toShort) }
      .toDF("bits")
      .select(col("bits"), Widening.float16(col("bits")).as("f"))
      .collect().map(r => (r.getShort(0) & 0xFFFF, r.getFloat(1))).toMap
    golden.foreach { case (bits, want) =>
      val got = rows(bits)
      assert(got == want && got.sign == want.sign,
        s"0x${bits.toHexString}: got $got want $want")
    }
    val special = Seq(0x7C00, 0xFC00, 0x7E00)
      .map(b => Tuple1(b.toShort)).toDF("bits")
      .select(Widening.float16(col("bits")).as("f"))
      .collect().map(_.getFloat(0))
    assert(special(0).isPosInfinity && special(1).isNegInfinity && special(2).isNaN)
  }

  test("time32/time64 convert to microseconds-of-day, ns truncating") {
    val r = Seq((45296, 45296123, 45296123456L, 45296123456789L))
      .toDF("s", "ms", "us", "ns")
      .select(Widening.timeToMicros(col("s"), "s").as("a"),
              Widening.timeToMicros(col("ms"), "ms").as("b"),
              Widening.timeToMicros(col("us"), "us").as("c"),
              Widening.timeToMicros(col("ns"), "ns").as("d"))
      .collect()(0)
    assert(r.getLong(0) == 45296000000L)  // 12:34:56
    assert(r.getLong(1) == 45296123000L)
    assert(r.getLong(2) == 45296123456L)
    assert(r.getLong(3) == 45296123456L)  // ns truncated to µs
    intercept[IllegalArgumentException](Widening.timeToMicros(col("s"), "h"))
  }

  test("duration µs widens to a day-time interval at µs precision") {
    val r = Seq(Tuple1(90061000001L)).toDF("us") // 1d 1h 1m 1.000001s
      .select(Widening.durationMicros(col("us")).as("iv"),
              expr("INTERVAL '1 01:01:01.000001' DAY TO SECOND").as("want"))
      .collect()(0)
    assert(r.get(0) == r.get(1), s"${r.get(0)} != ${r.get(1)}")
  }

  test("union encodes as struct-of-nullables keyed by tag") {
    val rows = Seq((0, 7, "x"), (1, 8, "y"))
      .toDF("tag", "iv", "sv")
      .select(Widening.unionAsStruct(col("tag"),
        Seq((0, "as_int", col("iv")), (1, "as_str", col("sv")))).as("u"))
      .select(col("u.tag"), col("u.as_int"), col("u.as_str"))
      .collect()
    assert(rows(0).getInt(0) == 0 && rows(0).getInt(1) == 7 && rows(0).isNullAt(2))
    assert(rows(1).getInt(0) == 1 && rows(1).isNullAt(1) && rows(1).getString(2) == "y")
  }
}
