package graft.sources

import java.nio.file.{Files, Paths}

/** Deterministic multi-day raw-zone generator — bench/verify scaffolding
  * for the flagship lifecycle ([[graft.Pipeline.backfill]]): N snapshot
  * days in the JSON-lines raw form, each with `moviesPerDay` movies whose
  * id window SLIDES day over day (~80% overlap, like a real popularity
  * window) so the lake's dynamic partition overwrites, LWW upserts and
  * per-day manifests all do real work. Driver-side file IO by design:
  * this fabricates the *input contract* of the pipeline (the reference's
  * fetch stage), it is not an engine operator.
  *
  * Shapes mirror the reference fixtures: popular pages (one JSONL file),
  * details for 90% of ids (imdb ids for 80% of those), per-file OMDb docs
  * for the even imdb ids. All values are pure functions of (day, id) —
  * two generations of the same (dates, moviesPerDay) are byte-identical
  * modulo the envelope timestamp, which staging drops. */
object SyntheticRaw {

  private def meta(day: String, src: String, ep: String) =
    s""""_meta":{"snapshot_date":"$day","run_id":"bench","extracted_at_utc":"${day}T00:00:00+00:00","source":"$src","endpoint":"$ep"}"""

  def writeDays(root: String, dates: Seq[String], moviesPerDay: Int): Unit = {
    require(moviesPerDay >= 10, s"need >=10 movies/day (got $moviesPerDay)")
    dates.zipWithIndex.foreach { case (day, d) =>
      // sliding id window: day d covers ids [1 + d*w/5, moviesPerDay + d*w/5]
      val off = d * moviesPerDay / 5
      val ids = (1 + off) to (moviesPerDay + off)
      val dDir = s"date=$day"

      val results = ids.map { i =>
        s"""{"id":$i,"title":"M$i","release_date":"20${10 + i % 15}-01-0${1 + i % 9}","popularity":${(i + d) % 100}.5,"vote_average":${1 + i % 9}.25,"vote_count":${i + d},"original_language":"en","genre_ids":[${i % 20}]}"""
      }.mkString(",")
      val popDir = Paths.get(root, "tmdb", "popular", dDir)
      Files.createDirectories(popDir)
      Files.writeString(popDir.resolve("popular.json"),
        s"""{${meta(day, "tmdb", "popular")},"data":{"page":1,"results":[$results]}}""" + "\n")

      val detLines = ids.filter(_ % 10 != 0).map { i =>
        val imdb = if (i % 5 == 0) "null" else s""""tt$i""""
        s"""{${meta(day, "tmdb", "details")},"data":{"id":$i,"imdb_id":$imdb,"title":"M$i","release_date":"","runtime":${60 + i % 120},"status":"Released","original_language":"en","genres":[{"id":1,"name":"G"}],"production_countries":[{"iso_3166_1":"US","name":"US"}]}}"""
      }
      val detDir = Paths.get(root, "tmdb", "details", dDir)
      Files.createDirectories(detDir)
      Files.writeString(detDir.resolve("details.json"), detLines.mkString("\n") + "\n")

      val omdbDir = Paths.get(root, "omdb", "ratings", dDir)
      Files.createDirectories(omdbDir)
      ids.filter(i => i % 10 != 0 && i % 5 != 0 && i % 2 == 0).foreach { i =>
        Files.writeString(omdbDir.resolve(s"tt$i.json"),
          s"""{${meta(day, "omdb", "ratings")},"data":{"Response":"True","Title":"M$i","imdbRating":"${1 + i % 9}.1","imdbVotes":"${i},000","Metascore":"${i % 100}","Rated":"PG","Type":"movie","Year":"2020","Country":"US","Genre":"G","Director":"D","Actors":"A","Ratings":[]}}""")
      }
    }
  }
}
