package graft

import java.sql.Date

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Relational
import graft.sources.Csv

/** S1/S2 over reference-shaped micro-fixtures (FIXTURES.md §2): header
  * CSV scan with declared schema, ordinal projection, date parsing with
  * unparseable→NULL, and the dedup-then-key dimension idiom. */
class CsvSpec extends SparkSpec {
  import spark.implicits._

  private def res(name: String): String =
    getClass.getResource(s"/worldcup/$name").getPath

  private val playersSchema = StructType(Seq(
    StructField("player_id", StringType),
    StructField("family_name", StringType),
    StructField("given_name", StringType),
    StructField("birth_date", DateType),
    StructField("goal_keeper", IntegerType),
    StructField("defender", IntegerType)))

  private val stadiumsSchema = StructType(Seq(
    StructField("stadium_id", StringType),
    StructField("stadium_name", StringType),
    StructField("city_name", StringType),
    StructField("country_name", StringType),
    StructField("capacity", IntegerType)))

  test("declared-schema CSV scan parses dates; empty date -> NULL") {
    val df = Csv.read(spark, res("players.csv"), playersSchema)
    val rows = df.select("player_id", "birth_date")
      .as[(String, Option[Date])].collect().sortBy(_._1)
    assert(rows(0) == ("P-1", Some(Date.valueOf("1969-06-15"))))
    assert(rows(2)._2.isEmpty)
  }

  test("ordinal projection keeps only the reference's consumed columns") {
    val df = Csv.readOrdinals(spark, res("stadiums.csv"), stadiumsSchema,
      Seq(2, 3))
    assert(df.columns.toSeq == Seq("city_name", "country_name"))
    assert(df.count() == 3)
  }

  test("city dimension build: dedup + surrogate key (reference A1+A2)") {
    val cities = Csv.readOrdinals(spark, res("stadiums.csv"), stadiumsSchema,
        Seq(2, 3)).distinct()
    val dim = Relational.surrogateKey(cities, "CTY-", "city_id",
        Seq(col("city_name")))
      .select("city_id", "city_name", "country_name")
      .as[(String, String, String)].collect().sortBy(_._1)
    assert(dim.toSeq == Seq(
      ("CTY-1", "Mexico City", "Mexico"),
      ("CTY-2", "Milan", "Italy")))
  }
}
