package graft

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.operators.Relational
import graft.sources.Csv

/** S1/S2 over reference-shaped micro-fixtures (FIXTURES.md §2): header
  * CSV scan with declared schema, ordinal projection, date parsing with
  * unparseable→NULL, and the dedup-then-key dimension idiom. */
class CsvSpec extends SparkSpec {
  import spark.implicits._

  private def res(name: String): String =
    getClass.getResource(s"/worldcup/$name").getPath

  test("declared-schema CSV scan parses dates; empty date -> NULL") {
    val df = Csv.read(spark, res("players.csv"),
      graft.etl.WorldCup.schemas("players"))
    val rows = df.select("player_id", "birth_date")
      .as[(String, Option[Date])].collect().sortBy(_._1)
    assert(rows(0) == ("P-1", Some(Date.valueOf("1945-09-11"))))
    assert(rows(3)._2.isEmpty)
  }

  test("ordinal projection keeps only the reference's consumed columns") {
    val df = Csv.readOrdinals(spark, res("stadiums.csv"),
      graft.etl.WorldCup.schemas("stadiums"), Seq(3, 4))
    assert(df.columns.toSeq == Seq("city_name", "country_name"))
    assert(df.count() == 4)
  }

  test("city dimension build: dedup + surrogate key (reference A1+A2)") {
    val cities = Csv.readOrdinals(spark, res("stadiums.csv"),
        graft.etl.WorldCup.schemas("stadiums"), Seq(3, 4)).distinct()
    val dim = Relational.surrogateKey(cities, "CTY-", "city_id",
        Seq(col("city_name")))
      .select("city_id", "city_name", "country_name")
      .as[(String, String, String)].collect().sortBy(_._1)
    assert(dim.toSeq == Seq(
      ("CTY-1", "Frankfurt", "West Germany"),
      ("CTY-2", "Mexico City", "Mexico"),
      ("CTY-3", "Munich", "West Germany")))
  }

  test("readQuarantined + Quarantine.ingest: type-corrupt CSV rows are " +
    "kept as evidence, clean rows parse, counts reconcile") {
    import org.apache.spark.sql.types.{LongType, StringType, StructType}
    import graft.sources.Quarantine
    val dir = java.nio.file.Files.createTempDirectory("csvq").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "rows.csv"),
      """id,name
        |1,alpha
        |not_a_number,beta
        |3,gamma
        |""".stripMargin)
    val schema = new StructType()
      .add("id", LongType).add("name", StringType)
    val parsed = Csv.readQuarantined(spark, dir, schema)
    val (clean, quar) = Quarantine.ingest(spark, parsed, "spec_csv",
      Quarantine.csvReason)
    assert(clean.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    assert(quar.select("reason").as[String].collect().toSeq ==
      Seq("malformed_row"))
    assert(quar.select("raw").as[String].head() == "not_a_number,beta")
    assert(clean.count() + quar.count() == 3L)
  }
}
