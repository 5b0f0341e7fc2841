package graft

import java.nio.file.{Files, Path}

/** Deterministic raw-zone fixtures per FIXTURES.md: pretty-printed
  * one-object-per-file JSON, enveloped (with one bare and one corrupt file
  * to exercise unwrap and PERMISSIVE tolerance). Five movies cover every
  * edge semantic the reference encodes:
  *
  *  - 101 Alpha: full match; comma imdbVotes; weighted composite; hidden gem
  *  - 102 Beta: empty release_date + runtime; N/A imdbRating/imdbVotes →
  *    composite falls to tmdb_rating even though Metascore present
  *  - 103 Gamma: details imdb_id NULL → OMDb join can never match (J2);
  *    overhyped via coalesce fallback to tmdb_rating
  *  - 104 Delta: no details file at all (J1 unmatched)
  *  - 105 Epsilon: OMDb Response "False" → dropped at load (S8)
  *  - tt9999: orphan OMDb doc (no popular movie references it)
  */
object MovieFixtures {

  val SnapshotDate = "2026-02-18"
  val RunId = "20260217T190700"

  private def meta(endpoint: String, source: String, at: String,
                   date: String): String =
    s"""  "_meta": {
       |    "snapshot_date": "$date",
       |    "run_id": "$RunId",
       |    "extracted_at_utc": "$at",
       |    "source": "$source",
       |    "endpoint": "$endpoint"
       |  }""".stripMargin

  private def write(dir: Path, name: String, content: String): Unit = {
    Files.createDirectories(dir)
    Files.writeString(dir.resolve(name), content)
  }

  /** Populate `<root>/{tmdb,omdb}/...{popular,details,ratings}/date=…` and
    * return the root as a string. */
  def writeRawZone(root: Path, date: String = SnapshotDate): String = {
    val d = s"date=$date"

    def movie(id: Int, title: String, release: String, pop: Double,
              va: Double, vc: Int, lang: String, genres: String): String =
      s"""    {
         |      "id": $id, "title": "$title", "release_date": "$release",
         |      "popularity": $pop, "vote_average": $va, "vote_count": $vc,
         |      "original_language": "$lang", "genre_ids": $genres
         |    }""".stripMargin

    write(root.resolve(s"tmdb/popular/$d"), "popular_movies.json",
      s"""{
         |${meta("popular", "tmdb", "2026-02-17T19:07:12.345678+00:00", date)},
         |  "data": {
         |    "page": 1,
         |    "results": [
         |${Seq(
             movie(101, "Alpha", "2020-05-01", 25.0, 8.1, 1000, "en", "[18, 80]"),
             movie(102, "Beta", "", 45.0, 6.5, 500, "fr", "[35]"),
             movie(103, "Gamma", "2021-07-15", 60.0, 5.0, 2000, "en", "[28]"),
             movie(104, "Delta", "2019-01-01", 10.0, 7.0, 300, "de", "[99]"),
             movie(105, "Epsilon", "2022-03-03", 33.3, 6.9, 800, "en", "[12, 14]")
           ).mkString(",\n")}
         |    ]
         |  }
         |}""".stripMargin)

    def details(id: Int, imdb: String, title: String, release: String,
                runtime: String, status: String): String =
      s"""{
         |${meta("details", "tmdb", "2026-02-17T19:07:20.000000+00:00", date)},
         |  "data": {
         |    "id": $id, "imdb_id": $imdb, "title": "$title",
         |    "release_date": "$release", "runtime": $runtime, "status": "$status",
         |    "original_language": "en",
         |    "genres": [{"id": 18, "name": "Drama"}],
         |    "production_countries": [{"iso_3166_1": "US", "name": "United States"}]
         |  }
         |}""".stripMargin

    val detDir = root.resolve(s"tmdb/details/$d")
    // 101 twice: a BARE (no envelope) stale duplicate with wrong runtime,
    // and the enveloped fresh one — last-write-wins must keep runtime 120
    // (bare ⇒ no extracted_at_utc ⇒ sorts last under desc_nulls_last)
    write(detDir, "101_stale.json",
      """{
        |  "id": 101, "imdb_id": "tt0101", "title": "Alpha",
        |  "release_date": "2020-05-01", "runtime": 999, "status": "Rumored",
        |  "original_language": "en",
        |  "genres": [{"id": 18, "name": "Drama"}],
        |  "production_countries": [{"iso_3166_1": "US", "name": "United States"}]
        |}""".stripMargin)
    write(detDir, "101.json", details(101, "\"tt0101\"", "Alpha", "2020-05-01", "120", "Released"))
    write(detDir, "102.json", details(102, "\"tt0102\"", "Beta", "", "\"\"", "Released"))
    write(detDir, "103.json", details(103, "null", "Gamma", "2021-07-15", "90", "Released"))
    // no details for 104
    write(detDir, "105.json", details(105, "\"tt0105\"", "Epsilon", "2022-03-03", "100", "Released"))
    write(detDir, "broken.json", """{"id": 999, "imdb_id": BROKEN!!""")

    def omdb(response: String, title: String, rating: String, votes: String,
             metascore: String): String =
      s"""{
         |${meta("ratings", "omdb", "2026-02-17T19:07:30.000000+00:00", date)},
         |  "data": {
         |    "Response": "$response", "Title": "$title",
         |    "imdbRating": "$rating", "imdbVotes": "$votes", "Metascore": "$metascore",
         |    "Rated": "PG-13", "Type": "movie", "Year": "2020",
         |    "Country": "USA", "Genre": "Drama", "Director": "D. Rector",
         |    "Actors": "A. One, B. Two",
         |    "Ratings": [{"Source": "Internet Movie Database", "Value": "$rating/10"}]
         |  }
         |}""".stripMargin

    val omdbDir = root.resolve(s"omdb/ratings/$d")
    write(omdbDir, "tt0101.json", omdb("True", "Alpha", "7.5", "1,234,567", "80"))
    write(omdbDir, "tt0102.json", omdb("True", "Beta", "N/A", "N/A", "55"))
    write(omdbDir, "tt0105.json", omdb("False", "Epsilon", "N/A", "N/A", "N/A"))
    write(omdbDir, "tt9999.json", omdb("True", "Orphan", "9.9", "42", "99"))

    root.toString
  }

  /** Fresh temp raw zone + pipeline config rooted under one temp dir. */
  def tempConfig(): Pipeline.Config = {
    val base = Files.createTempDirectory("graft-movie-")
    val rawRoot = writeRawZone(base.resolve("raw"))
    Pipeline.Config(
      rawRoot = rawRoot,
      lakeRoot = base.resolve("lake").toString,
      servingDir = base.resolve("serving").toString,
      snapshotDate = SnapshotDate,
      runId = RunId)
  }
}
