package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins the contract that `Tables.events` tolerates every physical `ts`
  * vintage the driver's testdata generator has produced so far:
  *
  *   - TIMESTAMP(NANOS) — which, under the legacy nanosAsLong flag the
  *     loader sets, surfaces as a LongType nanos column (simulated here
  *     by writing the long column directly, which is exactly what the
  *     reader yields for that vintage);
  *   - timestamp[us] with no zone (TIMESTAMP_NTZ) — the 2026-08-13
  *     regeneration;
  *   - session-zone TimestampType — the trivially-passing case.
  *
  * All three must come back as the identical session-zone TimestampType
  * values, so every downstream events_* operator is insulated from the
  * next regeneration.
  */
class EventsSchemaToleranceSpec extends SparkTestBase {

  private def roundTrip(write: String => Unit): org.apache.spark.sql.DataFrame = {
    val dir = Files.createTempDirectory("events-vintage-").toString
    write(s"$dir/events.parquet")
    Tables.events(spark, dir)
  }

  // 2021-03-04T05:06:07.123456Z and an exact-second neighbour.
  private val micros = Seq(1614834367123456L, 1614834368000000L)

  test("all ts vintages normalize to identical session-zone timestamps") {
    import spark.implicits._

    val fromNanosLong = roundTrip { path =>
      micros.zipWithIndex
        .map { case (us, i) => (i.toLong, us * 1000L, s"u$i", "click", 1.0) }
        .toDF("event_id", "ts", "user_id", "kind", "amount")
        .write.parquet(path)
    }

    val fromNtz = roundTrip { path =>
      micros.zipWithIndex
        .map { case (us, i) => (i.toLong, us, s"u$i", "click", 1.0) }
        .toDF("event_id", "ts", "user_id", "kind", "amount")
        .withColumn("ts", timestamp_micros($"ts").cast(TimestampNTZType))
        .write.parquet(path)
    }

    val fromSessionTz = roundTrip { path =>
      micros.zipWithIndex
        .map { case (us, i) => (i.toLong, us, s"u$i", "click", 1.0) }
        .toDF("event_id", "ts", "user_id", "kind", "amount")
        .withColumn("ts", timestamp_micros($"ts"))
        .write.parquet(path)
    }

    for (df <- Seq(fromNanosLong, fromNtz, fromSessionTz)) {
      assert(df.schema("ts").dataType === TimestampType)
      val got = df.select(unix_micros($"ts")).as[Long].collect().sorted
      assert(got.toSeq === micros)
    }
  }

  test("the real testdata loads with a TimestampType ts and sane bounds") {
    val ev = Tables.events(spark, sfDir)
    assert(ev.schema("ts").dataType === TimestampType)
    val n = ev.count()
    assert(n > 0)
    // Timestamps must land in a plausible era, not 1970-epoch garbage
    // from a mis-scaled conversion.
    val years = ev.select(min(year(col("ts"))), max(year(col("ts")))).head()
    assert(years.getInt(0) >= 1990 && years.getInt(1) <= 2100)
  }
}
