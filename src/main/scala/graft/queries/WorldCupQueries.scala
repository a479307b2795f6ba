package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, IntegerType, StringType}

import graft.etl.WorldCup

/** Oracle-gated correctness for the 27-table ELT pipeline (Surface A).
  *
  * The trickiest reference builders (`scripts/build_db.py:943-1040`
  * match FT/ET/PS + shootout nulling, `:1045-1146` event diagonal
  * union, `:736-807` tournament_schedule stage_detail, `:1267-1327`
  * team_appearance penalty arithmetic) are re-executed by DuckDB over
  * the SAME fixture CSVs the Spark pipeline reads, so the driver's
  * hash gate covers the ELT semantics end-to-end — not just the
  * builder-authored ScalaTest fixtures.
  *
  * The DuckDB `read_csv` column types are GENERATED from
  * [[WorldCup.schemas]], so both engines parse the CSVs under the
  * same declared schema by construction.
  */
object WorldCupQueries {

  /** Fixture CSVs live in-repo; both engines read them by absolute
    * path, independent of the sf data directory. Overridable for
    * checkouts elsewhere (system property wins over env var). */
  val fixturesDir: String =
    sys.props.get("graft.worldcup.fixtures")
      .orElse(sys.env.get("GRAFT_WORLDCUP_FIXTURES"))
      .getOrElse("/root/repo/src/test/resources/worldcup")

  private def built(s: SparkSession, name: String): DataFrame =
    WorldCup.build(s, WorldCup.csvSources(s, fixturesDir))(name)

  /** DuckDB scan of a fixture CSV under the Spark-declared schema. */
  private def duckCsv(name: String): String = {
    val cols = WorldCup.schemas(name).fields.map { f =>
      val t = f.dataType match {
        case StringType  => "VARCHAR"
        case IntegerType => "INTEGER"
        case DateType    => "DATE"
        case other => sys.error(s"unmapped CSV type $other")
      }
      s"'${f.name}': '$t'"
    }.mkString(", ")
    s"read_csv('$fixturesDir/$name.csv', header=true, columns={$cols})"
  }

  /** stage dim twin: surrogate keys by stage_name order (the Spark
    * side's Relational.surrogateKey over the distinct stage rows) —
    * the ONE derivation every stage-consuming oracle shares. */
  private def duckStage: String =
    s"""stage AS (
       |  SELECT 'STG-' || CAST(row_number() OVER (ORDER BY stage_name)
       |           AS VARCHAR) AS stage_id,
       |         upper(substr(stage_name, 1, 1)) || substr(stage_name, 2)
       |           AS name,
       |         CASE WHEN group_stage = 1 THEN 'Group'
       |              ELSE 'Knockout' END AS type,
       |         stage_name AS orig_stage_name
       |  FROM (SELECT DISTINCT stage_name, group_stage
       |        FROM ${duckCsv("tournament_stages")}))""".stripMargin

  /** federation dim twin (shared by e10 and the e21 team resolve). */
  private def duckFederation: String =
    s"""fed AS (
       |  SELECT 'FED-' || CAST(row_number() OVER (ORDER BY federation_name)
       |           AS VARCHAR) AS federation_id,
       |         federation_name,
       |         CASE WHEN region_name = 'Europe, Asia' THEN 'Eurasia'
       |              ELSE region_name END AS region_name,
       |         federation_wikipedia_link AS wikipedia_link,
       |         confederation_id
       |  FROM (SELECT DISTINCT federation_name, region_name,
       |               federation_wikipedia_link, confederation_id
       |        FROM ${duckCsv("teams")}))""".stripMargin

  /** city dim twin (shared by e12 and the e22 stadium resolve). */
  private def duckCity: String =
    s"""city AS (
       |  SELECT 'CTY-' || CAST(row_number() OVER
       |           (ORDER BY city_name, country_name) AS VARCHAR) AS city_id,
       |         city_name, country_name,
       |         city_wikipedia_link AS wikipedia_link
       |  FROM (SELECT DISTINCT city_name, country_name, city_wikipedia_link
       |        FROM ${duckCsv("stadiums")}))""".stripMargin

  /** position dim twin: surrogate keys by position_code order. */
  private def duckPosition: String =
    s"""pos AS (
       |  SELECT 'POS-' || CAST(row_number() OVER (ORDER BY position_code)
       |           AS VARCHAR) AS position_id,
       |         position_code, position_name
       |  FROM (SELECT DISTINCT position_code, position_name
       |        FROM ${duckCsv("player_appearances")}))""".stripMargin

  /** stage_detail rule twin (capitalize / de-pluralize trailing 's'). */
  private def duckStageDetail(g: String, st: String): String =
    s"""CASE WHEN contains($g, 'Group') THEN $g
       |       ELSE CASE WHEN $st LIKE '%s'
       |         THEN upper(substr($st, 1, 1)) ||
       |              substr($st, 2, greatest(length($st) - 2, 0))
       |         ELSE upper(substr($st, 1, 1)) || substr($st, 2) END
       |  END""".stripMargin

  val specs: Seq[QuerySpec] = Seq(

    QuerySpec("e1_worldcup_match",
      "ELT `match` builder vs DuckDB re-execution: stage surrogate-key " +
        "resolve, datetime parse, FT/ET/PS classification, " +
        "shootout-score nulling (build_db.py:943-1040)",
      (s, dir) => built(s, "match").orderBy(col("id")),
      Some(s"""WITH $duckStage,
              |m AS (SELECT * FROM ${duckCsv("matches")})
              |SELECT m.match_id AS id, m.tournament_id, s.stage_id,
              |  ${duckStageDetail("m.group_name", "m.stage_name")} AS stage_detail,
              |  m.home_team_id, m.away_team_id, m.match_name AS name,
              |  strptime(m.match_date || ' ' || m.match_time,
              |           '%Y-%m-%d %H:%M') AS datetime,
              |  m.stadium_id,
              |  CASE WHEN m.extra_time + m.penalty_shootout = 0 THEN 'FT'
              |       WHEN m.extra_time + m.penalty_shootout = 1 THEN 'ET'
              |       ELSE 'PS' END AS completed,
              |  m.result, m.score, m.home_team_score, m.away_team_score,
              |  CASE WHEN m.penalty_shootout = 1 THEN m.score_penalties END
              |    AS penalty_shootout_score,
              |  CASE WHEN m.penalty_shootout = 1
              |       THEN m.home_team_score_penalties END
              |    AS home_team_penalty_score,
              |  CASE WHEN m.penalty_shootout = 1
              |       THEN m.away_team_score_penalties END
              |    AS away_team_penalty_score
              |FROM m JOIN stage s ON m.stage_name = s.orig_stage_name
              |ORDER BY id""".stripMargin)),

    QuerySpec("e2_worldcup_event",
      "ELT `event` builder vs DuckDB re-execution: goals + melted " +
        "bookings/substitutions diagonal union, literal event_type " +
        "dim, distributed md5 fact keys (build_db.py:1045-1146)",
      (s, dir) => built(s, "event").orderBy(col("id")),
      Some {
        val evCols = "match_id, team_id, player_id, minute_label, " +
          "minute_regulation, minute_stoppage, match_period"
        val typeCase = Seq("goal" -> 1, "own goal" -> 2, "penalty" -> 3,
          "going_off" -> 4, "coming_on" -> 5, "yellow_card" -> 6,
          "second_yellow_card" -> 7, "red_card" -> 8)
          .map { case (n, i) => s"WHEN '$n' THEN 'EV-$i'" }.mkString(" ")
        s"""WITH long AS (
           |  SELECT $evCols,
           |    CASE WHEN own_goal = 1 THEN 'own goal'
           |         WHEN penalty = 1 THEN 'penalty'
           |         ELSE 'goal' END AS variable
           |  FROM ${duckCsv("goals")}
           |  UNION ALL
           |  SELECT $evCols, 'yellow_card' FROM ${duckCsv("bookings")}
           |  WHERE yellow_card = 1
           |  UNION ALL
           |  SELECT $evCols, 'second_yellow_card' FROM ${duckCsv("bookings")}
           |  WHERE second_yellow_card = 1
           |  UNION ALL
           |  SELECT $evCols, 'red_card' FROM ${duckCsv("bookings")}
           |  WHERE red_card = 1
           |  UNION ALL
           |  SELECT $evCols, 'going_off' FROM ${duckCsv("substitutions")}
           |  WHERE going_off = 1
           |  UNION ALL
           |  SELECT $evCols, 'coming_on' FROM ${duckCsv("substitutions")}
           |  WHERE coming_on = 1),
           |typed AS (
           |  SELECT *, CASE variable $typeCase END AS event_type_id
           |  FROM long),
           |keyed AS (
           |  SELECT *, row_number() OVER (
           |    PARTITION BY match_id, team_id, player_id, event_type_id,
           |                 minute_label
           |    ORDER BY minute_regulation NULLS FIRST,
           |             minute_stoppage NULLS FIRST,
           |             match_period NULLS FIRST) AS rn
           |  FROM typed)
           |SELECT 'MEV-' || md5(
           |    coalesce(md5(match_id), '-') || '|' || coalesce(md5(team_id), '-')
           |    || '|' || coalesce(md5(player_id), '-')
           |    || '|' || coalesce(md5(event_type_id), '-')
           |    || '|' || coalesce(md5(minute_label), '-')
           |    || '|' || CAST(rn AS VARCHAR)) AS id,
           |  match_id, team_id, player_id, event_type_id, minute_label,
           |  minute_regulation, minute_stoppage, match_period
           |FROM keyed
           |ORDER BY id""".stripMargin
      }),

    QuerySpec("e3_worldcup_schedule",
      "ELT `tournament_schedule` builder vs DuckDB re-execution: " +
        "composite-key join, stage_detail rule, double distinct " +
        "(build_db.py:736-807)",
      (s, dir) => built(s, "tournament_schedule")
        .orderBy(col("tournament_id"), col("stage_id"), col("stage_detail")),
      Some(s"""WITH $duckStage,
              |joined AS (
              |  SELECT DISTINCT m.tournament_id, m.stage_name, m.group_name,
              |    t.stage_number, t.start_date, t.end_date, t.count_matches,
              |    t.count_teams, t.count_scheduled, t.count_replays,
              |    t.count_playoffs, t.count_walkovers
              |  FROM (SELECT tournament_id, stage_name, group_name
              |        FROM ${duckCsv("matches")}) m
              |  JOIN ${duckCsv("tournament_stages")} t
              |    USING (tournament_id, stage_name))
              |SELECT DISTINCT j.tournament_id, s.stage_id,
              |  ${duckStageDetail("j.group_name", "j.stage_name")} AS stage_detail,
              |  j.stage_number AS sort_order, j.start_date, j.end_date,
              |  j.count_matches AS n_matches, j.count_teams AS n_teams,
              |  j.count_scheduled AS n_scheduled, j.count_replays AS n_replays,
              |  j.count_playoffs AS n_playoffs, j.count_walkovers AS n_walkovers
              |FROM joined j JOIN stage s ON j.stage_name = s.orig_stage_name
              |ORDER BY tournament_id, stage_id, stage_detail""".stripMargin)),

    QuerySpec("e5_worldcup_group_performance",
      "ELT `tournament_team_group_performance` builder vs DuckDB: " +
        "stage resolve + flag-to-boolean (build_db.py:1362-1418)",
      (s, dir) => built(s, "tournament_team_group_performance")
        .orderBy(col("tournament_id"), col("stage_id"), col("stage_detail"),
          col("team_id")),
      Some(s"""WITH $duckStage
              |SELECT g.tournament_id, s.stage_id,
              |  g.group_name AS stage_detail, g.team_id, g.position,
              |  g.played AS n_played, g.wins AS n_wins, g.draws AS n_draws,
              |  g.losses AS n_losses, g.goals_for, g.goals_against,
              |  g.goal_difference, g.points,
              |  (g.advanced = 1) AS did_advance
              |FROM ${duckCsv("group_standings")} g
              |JOIN stage s ON g.stage_name = s.orig_stage_name
              |ORDER BY tournament_id, stage_id, stage_detail, team_id""".stripMargin)),

    QuerySpec("e6_worldcup_tournament",
      "ELT `tournament` builder vs DuckDB: winner-name -> team-id " +
        "resolve (J2) with date columns (build_db.py:658-693)",
      (s, dir) => built(s, "tournament").orderBy(col("id")),
      Some(s"""SELECT t.tournament_id AS id, t.tournament_name AS name,
              |  t.year, t.start_date, t.end_date,
              |  t.count_teams AS n_team, tm.team_id AS wining_team_id
              |FROM ${duckCsv("tournaments")} t
              |JOIN ${duckCsv("teams")} tm ON t.winner = tm.team_name
              |ORDER BY id""".stripMargin)),

    QuerySpec("e7_worldcup_tournament_team",
      "ELT `tournament_team` builder vs DuckDB: left join -> is_host " +
        "null-probe flag (build_db.py:817-857, the J4 idiom)",
      (s, dir) => built(s, "tournament_team")
        .orderBy(col("tournament_id"), col("team_id")),
      Some(s"""SELECT q.tournament_id, q.team_id,
              |  q.count_matches AS n_matches, q.performance,
              |  (h.team_name IS NOT NULL) AS is_host
              |FROM ${duckCsv("qualified_teams")} q
              |LEFT JOIN ${duckCsv("host_countries")} h
              |  USING (tournament_id, team_id)
              |ORDER BY tournament_id, team_id""".stripMargin)),

    QuerySpec("e8_worldcup_match_replay",
      "ELT `match_replay` builder vs DuckDB: filtered self-join pairing " +
        "each replayed final with its replay (build_db.py:1183-1217, J5)",
      (s, dir) => built(s, "match_replay")
        .orderBy(col("first_match_id"), col("second_match_id")),
      Some(s"""SELECT a.match_id AS first_match_id,
              |       b.match_id AS second_match_id
              |FROM ${duckCsv("matches")} a JOIN ${duckCsv("matches")} b
              |  ON a.home_team_id = b.home_team_id
              | AND a.away_team_id = b.away_team_id
              |WHERE a.replayed = 1 AND b.replay = 1
              |ORDER BY first_match_id, second_match_id""".stripMargin)),

    QuerySpec("e9_worldcup_tournament_squad",
      "ELT `tournament_squad` builder vs DuckDB: position surrogate " +
        "resolve by name + shirt-0 -> NULL string cast " +
        "(build_db.py:896-937, the P12 idiom)",
      (s, dir) => built(s, "tournament_squad")
        .orderBy(col("tournament_id"), col("team_id"), col("player_id")),
      Some(s"""WITH pos AS (
              |  SELECT 'POS-' || CAST(row_number() OVER (ORDER BY position_code)
              |           AS VARCHAR) AS position_id,
              |         position_name
              |  FROM (SELECT DISTINCT position_code, position_name
              |        FROM ${duckCsv("player_appearances")}))
              |SELECT s.tournament_id, s.team_id, s.player_id,
              |  CASE WHEN s.shirt_number <> 0
              |       THEN CAST(s.shirt_number AS VARCHAR) END AS shirt_number,
              |  p.position_id
              |FROM ${duckCsv("squads")} s
              |JOIN pos p USING (position_name)
              |ORDER BY tournament_id, team_id, player_id""".stripMargin)),

    QuerySpec("e10_worldcup_federation",
      "ELT `federation` builder vs DuckDB: dim dedup + ordered " +
        "surrogate keys + the 'Europe, Asia' -> Eurasia rewrite " +
        "(build_db.py:268-306, the A1/A2/P7 dim idiom)",
      (s, dir) => built(s, "federation").orderBy(col("id")),
      Some(s"""WITH $duckFederation
              |SELECT federation_id AS id, federation_name AS name,
              |       region_name, wikipedia_link, confederation_id
              |FROM fed
              |ORDER BY id""".stripMargin)),

    QuerySpec("e4_worldcup_team_appearance",
      "ELT `team_appearance` builder vs DuckDB re-execution: home/away " +
        "labeling, shootout nulling + penalty differential arithmetic " +
        "(build_db.py:1267-1327)",
      (s, dir) => built(s, "team_appearance")
        .orderBy(col("match_id"), col("team_id")),
      Some(s"""SELECT match_id, team_id, opponent_id AS opponent_team_id,
              |  CASE WHEN home_team = 1 THEN 'home' ELSE 'away' END
              |    AS home_away,
              |  result, goals_for, goals_against AS goals_againt,
              |  goal_differential,
              |  CASE WHEN penalty_shootout = 1 THEN penalties_for END
              |    AS penalties_for,
              |  CASE WHEN penalty_shootout = 1 THEN penalties_against END
              |    AS penalties_againt,
              |  CASE WHEN penalty_shootout = 1
              |       THEN penalties_for - penalties_against END
              |    AS penalties_differential
              |FROM ${duckCsv("team_appearances")}
              |ORDER BY match_id, team_id""".stripMargin)),

    QuerySpec("e11_worldcup_award",
      "ELT `award` dim vs DuckDB: rename select incl. the reference's " +
        "year_introuced spelling quirk (build_db.py:102-123)",
      (s, dir) => built(s, "award").orderBy(col("id")),
      Some(s"""SELECT award_id AS id, award_name AS name, description,
              |       year_introduced AS year_introuced
              |FROM ${duckCsv("awards")} ORDER BY id""".stripMargin)),

    QuerySpec("e12_worldcup_city",
      "ELT `city` dim vs DuckDB: stadium-city dedup + ordered " +
        "surrogate keys (build_db.py:135-164)",
      (s, dir) => built(s, "city").orderBy(col("id")),
      Some(s"""WITH $duckCity
              |SELECT city_id AS id, city_name AS name, country_name,
              |       wikipedia_link
              |FROM city
              |ORDER BY id""".stripMargin)),

    QuerySpec("e13_worldcup_confederation",
      "ELT `confederation` dim vs DuckDB: rename select " +
        "(build_db.py:172-199)",
      (s, dir) => built(s, "confederation").orderBy(col("id")),
      Some(s"""SELECT confederation_id AS id, confederation_code AS code,
              |       confederation_name AS name,
              |       confederation_wikipedia_link AS wikipedia_link
              |FROM ${duckCsv("confederations")} ORDER BY id""".stripMargin)),

    QuerySpec("e14_worldcup_event_type",
      "ELT `event_type` literal dim vs DuckDB: replace-FIRST underscore " +
        "(Polars str.replace semantics) + super_type cases " +
        "(build_db.py:214-256)",
      (s, dir) => built(s, "event_type").orderBy(col("id")),
      Some("""SELECT 'EV-' || CAST(i AS VARCHAR) AS id,
             |       regexp_replace(n, '_', ' ') AS name,
             |       CASE WHEN n IN ('goal', 'own goal', 'penalty') THEN 'goal'
             |            WHEN n IN ('going_off', 'coming_on') THEN 'substitution'
             |            ELSE 'booking' END AS super_type
             |FROM (VALUES (1, 'goal'), (2, 'own goal'), (3, 'penalty'),
             |             (4, 'going_off'), (5, 'coming_on'),
             |             (6, 'yellow_card'), (7, 'second_yellow_card'),
             |             (8, 'red_card')) AS t(i, n)
             |ORDER BY id""".stripMargin)),

    QuerySpec("e15_worldcup_manager",
      "ELT `manager` dim vs DuckDB: rename select incl. given_type " +
        "quirk (build_db.py:317-339)",
      (s, dir) => built(s, "manager").orderBy(col("id")),
      Some(s"""SELECT manager_id AS id, family_name,
              |       given_name AS given_type, country_name
              |FROM ${duckCsv("managers")} ORDER BY id""".stripMargin)),

    QuerySpec("e16_worldcup_position_type",
      "ELT `position_type` literal dim vs DuckDB (build_db.py:352-385)",
      (s, dir) => built(s, "position_type").orderBy(col("id")),
      Some("""SELECT * FROM (VALUES
             |  ('PTYP-1', 'GK', 'Goal Keeper'), ('PTYP-2', 'DF', 'Defence'),
             |  ('PTYP-3', 'MF', 'Midfield'), ('PTYP-4', 'FW', 'Forward'))
             |  AS t(id, code, name)
             |ORDER BY id""".stripMargin)),

    QuerySpec("e17_worldcup_position",
      "ELT `position` dim vs DuckDB: appearance-code dedup + ordered " +
        "surrogate keys + code -> type mapping (build_db.py:401-441)",
      (s, dir) => built(s, "position").orderBy(col("id")),
      Some(s"""WITH $duckPosition
              |SELECT position_id AS id, position_code AS code,
              |       position_name AS name,
              |  CASE WHEN position_code = 'GK' THEN 'PTYP-1'
              |       WHEN position_code IN ('DF', 'RB', 'LB', 'CB', 'SW',
              |                              'RWB', 'LWB') THEN 'PTYP-2'
              |       WHEN position_code IN ('FW', 'CF', 'SS', 'LF', 'RF')
              |         THEN 'PTYP-4'
              |       ELSE 'PTYP-3' END AS position_type_id
              |FROM pos
              |ORDER BY id""".stripMargin)),

    QuerySpec("e18_worldcup_player",
      "ELT `player` dim vs DuckDB: rename select with DATE column " +
        "(build_db.py:454-479)",
      (s, dir) => built(s, "player").orderBy(col("id")),
      Some(s"""SELECT player_id AS id, family_name, given_name AS given_type,
              |       birth_date, n_tournaments, wikipedia_link
              |FROM ${duckCsv("players")} ORDER BY id""".stripMargin)),

    QuerySpec("e19_worldcup_referee",
      "ELT `referee` dim vs DuckDB: rename select (build_db.py:487-512)",
      (s, dir) => built(s, "referee").orderBy(col("id")),
      Some(s"""SELECT referee_id AS id, family_name, given_name AS given_type,
              |       country_name, confederation_id, wikipedia_link
              |FROM ${duckCsv("referees")} ORDER BY id""".stripMargin)),

    QuerySpec("e20_worldcup_stage",
      "ELT `stage` dim vs DuckDB: name dedup, capitalize-first, " +
        "Group/Knockout typing (build_db.py:568-606)",
      (s, dir) => built(s, "stage").orderBy(col("id")),
      Some(s"""WITH $duckStage
              |SELECT stage_id AS id, name, type FROM stage
              |ORDER BY id""".stripMargin)),

    QuerySpec("e21_worldcup_team",
      "ELT `team` dim vs DuckDB: federation surrogate resolve by name " +
        "(build_db.py:617-646)",
      (s, dir) => built(s, "team").orderBy(col("id")),
      Some(s"""WITH $duckFederation
              |SELECT t.team_id AS id, t.team_code AS code,
              |       t.team_name AS name,
              |       t.team_wikipedia_link AS wikipedia_link, f.federation_id
              |FROM ${duckCsv("teams")} t JOIN fed f USING (federation_name)
              |ORDER BY id""".stripMargin)),

    QuerySpec("e22_worldcup_stadium",
      "ELT `stadium` dim vs DuckDB: city surrogate resolve by name " +
        "(build_db.py:522-555)",
      (s, dir) => built(s, "stadium").orderBy(col("id")),
      Some(s"""WITH $duckCity
              |SELECT s.stadium_id AS id, s.stadium_name AS name,
              |       s.stadium_capacity AS capacity,
              |       s.stadium_wikipedia_link AS wikipedia_link, c.city_id
              |FROM ${duckCsv("stadiums")} s JOIN city c USING (city_name)
              |ORDER BY id""".stripMargin)),

    QuerySpec("e23_worldcup_tournament_referee",
      "ELT `tournament_referee` fact vs DuckDB (build_db.py:706-728)",
      (s, dir) => built(s, "tournament_referee")
        .orderBy(col("tournament_id"), col("referee_id")),
      Some(s"""SELECT tournament_id, referee_id
              |FROM ${duckCsv("referee_appointments")}
              |ORDER BY tournament_id, referee_id""".stripMargin)),

    QuerySpec("e24_worldcup_tournament_manager",
      "ELT `tournament_manager` fact vs DuckDB (build_db.py:867-891)",
      (s, dir) => built(s, "tournament_manager")
        .orderBy(col("tournament_id"), col("team_id"), col("manager_id")),
      Some(s"""SELECT tournament_id, team_id, manager_id
              |FROM ${duckCsv("manager_appointments")}
              |ORDER BY tournament_id, team_id, manager_id""".stripMargin)),

    QuerySpec("e25_worldcup_penalty_kick",
      "ELT `penalty_kick` fact vs DuckDB: flag -> boolean " +
        "(build_db.py:1149-1178)",
      (s, dir) => built(s, "penalty_kick").orderBy(col("id")),
      Some(s"""SELECT penalty_kick_id AS id, match_id, team_id, player_id,
              |       (converted = 1) AS did_convert
              |FROM ${duckCsv("penalty_kicks")} ORDER BY id""".stripMargin)),

    QuerySpec("e26_worldcup_match_player",
      "ELT `match_player` fact vs DuckDB: position surrogate resolve " +
        "by code + starter/captain booleans (build_db.py:1224-1260)",
      (s, dir) => built(s, "match_player")
        .orderBy(col("match_id"), col("team_id"), col("player_id")),
      Some(s"""WITH $duckPosition
              |SELECT a.match_id, a.team_id, a.player_id, p.position_id,
              |       (a.starter = 1) AS is_starter,
              |       (a.captain = 1) AS is_captain
              |FROM ${duckCsv("player_appearances")} a
              |JOIN pos p USING (position_code)
              |ORDER BY match_id, team_id, player_id""".stripMargin)),

    QuerySpec("e27_worldcup_award_winner",
      "ELT `award_winner` fact vs DuckDB (build_db.py:1332-1356)",
      (s, dir) => built(s, "award_winner")
        .orderBy(col("tournament_id"), col("award_id"), col("player_id")),
      Some(s"""SELECT tournament_id, award_id, player_id
              |FROM ${duckCsv("award_winners")}
              |ORDER BY tournament_id, award_id, player_id""".stripMargin))
  )
}
