package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class IngestSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("time", TimestampType),
    StructField("user_id", LongType),
    StructField("value", DoubleType)))

  test("CSV round-trips micro-precision timestamps and doubles exactly") {
    val dir = tmpDir("graft-ingest-csv")
    val rows = Seq(
      (java.sql.Timestamp.valueOf("2024-03-01 10:15:30.123456"), 7L, 35.2),
      (java.sql.Timestamp.valueOf("2024-03-02 23:59:59.999999"), 9L, 0.01))
    val df = rows.toDF("time", "user_id", "value")
    Ingest.writeCsv(df, s"$dir/out")
    val (good, bad) = Ingest.quarantine(Ingest.readCsv(spark, s"$dir/out", schema))
    assert(bad.count() === 0)
    val got = good.as[(java.sql.Timestamp, Long, Double)].collect().sortBy(_._2)
    assert(got.toSeq === rows.sortBy(_._2))
  }

  test("JSONL round-trips the same rows") {
    val dir = tmpDir("graft-ingest-json")
    val rows = Seq(
      (java.sql.Timestamp.valueOf("2024-03-01 10:15:30.000007"), 1L, 123.45))
    Ingest.writeJsonl(rows.toDF("time", "user_id", "value"), s"$dir/out")
    val (good, bad) = Ingest.quarantine(Ingest.readJsonl(spark, s"$dir/out", schema))
    assert(bad.count() === 0)
    assert(good.as[(java.sql.Timestamp, Long, Double)].collect().toSeq === rows)
  }

  test("ORC round-trips micro-precision timestamps and doubles exactly") {
    val dir = tmpDir("graft-ingest-orc")
    val rows = Seq(
      (java.sql.Timestamp.valueOf("2024-03-01 10:15:30.123456"), 7L, 35.2),
      (java.sql.Timestamp.valueOf("2024-03-02 23:59:59.999999"), 9L, 0.01))
    Ingest.writeOrc(rows.toDF("time", "user_id", "value"), s"$dir/out")
    val got = Ingest.readOrc(spark, s"$dir/out", schema)
      .as[(java.sql.Timestamp, Long, Double)].collect().sortBy(_._2)
    assert(got.toSeq === rows.sortBy(_._2))
  }

  test("ORC read enforces the DECLARED schema, not the file's") {
    // the no-inference rule, columnar edition: the frame's shape is the
    // DECLARED schema regardless of what the file carries — a narrower
    // declaration prunes columns at the scan (the pushdown contract),
    // never surfacing undeclared ones.
    val dir = tmpDir("graft-ingest-orc-schema")
    Ingest.writeOrc(Seq((1L, 2.0)).toDF("user_id", "value"), s"$dir/out")
    val narrow = Ingest.readOrc(spark, s"$dir/out",
      StructType(Seq(StructField("value", DoubleType))))
    assert(narrow.columns.toSeq === Seq("value"))
    assert(narrow.as[Double].collect().toSeq === Seq(2.0))
  }

  test("a mangled line quarantines instead of failing the load") {
    val dir = tmpDir("graft-ingest-bad")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/in"))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/in/part.csv"),
      ("time,user_id,value\n" +
        "2024-03-01T10:00:00.000000Z,5,1.25\n" +
        "not-a-time,XX,oops\n" +
        "2024-03-02T11:00:00.000000Z,6,2.50\n").getBytes("UTF-8"))
    val (good, bad) = Ingest.quarantine(Ingest.readCsv(spark, s"$dir/in", schema))
    assert(good.count() === 2)
    assert(bad.as[String].collect().toSeq === Seq("not-a-time,XX,oops"))
    // JSONL: same contract
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/jin"))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/jin/part.json"),
      ("""{"time":"2024-03-01T10:00:00.000000Z","user_id":5,"value":1.25}""" + "\n" +
        "{broken json\n").getBytes("UTF-8"))
    val (jg, jb) = Ingest.quarantine(Ingest.readJsonl(spark, s"$dir/jin", schema))
    assert(jg.count() === 1)
    assert(jb.count() === 1)
  }
}
