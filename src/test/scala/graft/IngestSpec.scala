package graft

import java.nio.file.{Files, Paths}

import scala.collection.mutable

import org.apache.spark.sql.functions._

import graft.sources.Ingest

/** Ingestion-adapter loop (S1–S3) driven by a fixture-backed Fetcher:
  * asserts the reference's loop shape (popular → per-id details, skips on
  * missing id, one rate-limit sleep per detail GET), the raw-zone layout,
  * retry/backoff, and that the written files feed RawZone.readEnveloped
  * directly. */
class IngestSpec extends SparkSpec {
  import spark.implicits._

  private val popularJson =
    """{"page":1,"results":[
      |{"id":101,"title":"Alpha","popularity":9.5,"vote_average":8.0,"vote_count":100,"original_language":"fr","genre_ids":[1,2]},
      |{"id":102,"title":"Beta","popularity":5.0,"vote_average":6.5,"vote_count":50,"original_language":"en","genre_ids":[3]},
      |{"title":"NoId","popularity":1.0,"vote_average":1.0,"vote_count":1,"original_language":"en","genre_ids":[]}]}"""
      .stripMargin

  private def detailsJson(id: Long) =
    s"""{"id":$id,"imdb_id":"tt0$id","title":"T$id","release_date":"2020-01-01","runtime":"100","status":"Released","original_language":"fr","genres":[{"id":1,"name":"Drama"}],"production_countries":[{"iso_3166_1":"FR","name":"France"}]}"""

  private val omdbJson =
    """{"Response":"True","Title":"X","imdbRating":"7.0","imdbVotes":"1,000","Metascore":"70","Rated":"R","Type":"movie","Year":"2020","Country":"FR","Genre":"Drama","Director":"D","Actors":"A","Ratings":[]}"""

  private class FixtureFetcher extends Ingest.Fetcher {
    val calls = mutable.Buffer[(String, Map[String, String])]()
    override def get(url: String, params: Map[String, String]): String = {
      calls.append((url, params))
      if (url == Ingest.PopularUrl) popularJson
      else if (url.startsWith("https://api.themoviedb.org/3/movie/"))
        detailsJson(url.substring(url.lastIndexOf('/') + 1).toLong)
      else if (url.startsWith("https://www.omdbapi.com")) omdbJson
      else sys.error(s"unexpected url $url")
    }
  }

  test("fetchTmdbSnapshot: reference loop shape, layout, rate limiting") {
    val root = Files.createTempDirectory("graft_ingest").toString
    val cfg = Ingest.Config(root, "2026-03-05", "run1")
    val sleeps = mutable.Buffer[Long]()
    val fetcher = new FixtureFetcher
    val ids = Ingest.fetchTmdbSnapshot(fetcher, cfg, sleeps.append(_))
    assert(ids == Seq(101L, 102L)) // the missing-id row is skipped
    assert(sleeps.toSeq == Seq(250L, 250L)) // one sleep per detail GET
    // params mirror the reference: page=1 + language on the popular call,
    // language alone on details
    assert(fetcher.calls.head._2 == Map("language" -> "fr-FR", "page" -> "1"))
    assert(fetcher.calls(1)._2 == Map("language" -> "fr-FR"))
    // files land at the reference layout
    assert(Files.exists(Paths.get(root, "tmdb", "popular",
      "date=2026-03-05", "popular_movies.json")))
    assert(Files.exists(Paths.get(root, "tmdb", "details",
      "date=2026-03-05", "101.json")))
    // and the adapter's output feeds the engine's raw-zone reader directly
    val pop = graft.io.RawZone.readEnveloped(spark, root, "tmdb", "popular",
      "2026-03-05", graft.model.Schemas.popularPageSchema, multiLine = true)
    assert(pop.count() == 1)
    assert(pop.select(size(col("data.results"))).head().getInt(0) == 3)
    assert(pop.select("_meta.run_id").head().getString(0) == "run1")
    val det = graft.io.RawZone.readEnveloped(spark, root, "tmdb", "details",
      "2026-03-05", graft.model.Schemas.detailsSchema, multiLine = true)
    assert(det.select("data.id").as[Long].collect().sorted.toSeq == Seq(101L, 102L))
  }

  test("getWithRetry: transient failures back off linearly, hard failures rethrow") {
    val cfg = Ingest.Config("/tmp/unused", "2026-03-05", "r",
      maxAttempts = 3, backoffMs = 100)
    var n = 0
    val flaky = new Ingest.Fetcher {
      override def get(u: String, p: Map[String, String]): String = {
        n += 1; if (n < 3) throw new RuntimeException("transient") else "ok"
      }
    }
    val sleeps = mutable.Buffer[Long]()
    assert(Ingest.getWithRetry(flaky, "u", Map.empty, cfg, sleeps.append(_)) == "ok")
    assert(n == 3 && sleeps.toSeq == Seq(100L, 200L))
    val dead = new Ingest.Fetcher {
      override def get(u: String, p: Map[String, String]): String =
        throw new RuntimeException("down")
    }
    val e = intercept[RuntimeException] {
      Ingest.getWithRetry(dead, "u", Map.empty, cfg, _ => ())
    }
    assert(e.getMessage == "down")
  }

  // --- real transport: HttpFetcher against an in-process HTTP server ---

  private def withServer(test: (String, com.sun.net.httpserver.HttpServer) => Unit): Unit = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.start()
    try test(s"http://127.0.0.1:${server.getAddress.getPort}", server)
    finally server.stop(0)
  }

  private def respond(ex: com.sun.net.httpserver.HttpExchange, code: Int,
                      body: String): Unit = {
    val b = body.getBytes("UTF-8")
    ex.sendResponseHeaders(code, if (b.isEmpty) -1 else b.length.toLong)
    if (b.nonEmpty) ex.getResponseBody.write(b)
    ex.close()
  }

  test("HttpFetcher: success body, param encoding, 429 retry, non-2xx throw") {
    withServer { (base, server) =>
      val seen = mutable.Buffer[String]()
      var flakyLeft = 2
      server.createContext("/ok", ex => {
        seen.append(ex.getRequestURI.toString)
        respond(ex, 200, """{"hello":"world & more"}""")
      })
      server.createContext("/flaky", ex =>
        if (flakyLeft > 0) { flakyLeft -= 1; respond(ex, 429, "slow down") }
        else respond(ex, 200, "recovered"))
      server.createContext("/dead", ex => respond(ex, 500, "boom"))

      val f = new Ingest.HttpFetcher()
      // success path + URL encoding of query params
      assert(f.get(s"$base/ok", Map("language" -> "fr-FR", "q" -> "a b&c"))
        == """{"hello":"world & more"}""")
      assert(seen.head.startsWith("/ok?"))
      assert(seen.head.contains("language=fr-FR"))
      assert(seen.head.contains("q=a+b%26c"))

      // 429 rate-limit responses retry with linear backoff, then succeed
      val cfg = Ingest.Config("/tmp/unused", "2026-03-05", "r",
        maxAttempts = 3, backoffMs = 50)
      val sleeps = mutable.Buffer[Long]()
      assert(Ingest.getWithRetry(f, s"$base/flaky", Map.empty, cfg,
        sleeps.append(_)) == "recovered")
      assert(sleeps.toSeq == Seq(50L, 100L))

      // persistent non-2xx exhausts maxAttempts and surfaces the status
      val e = intercept[java.io.IOException] {
        Ingest.getWithRetry(f, s"$base/dead", Map.empty, cfg, _ => ())
      }
      assert(e.getMessage.contains("HTTP 500"))
    }
  }

  test("fetchTmdbSnapshot end-to-end over HttpFetcher (real transport, no network)") {
    withServer { (base, server) =>
      server.createContext("/3/movie/popular", ex => respond(ex, 200, popularJson))
      server.createContext("/3/movie/", ex => {
        val id = ex.getRequestURI.getPath.substring("/3/movie/".length).toLong
        respond(ex, 200, detailsJson(id))
      })
      val root = Files.createTempDirectory("graft_ingest_http").toString
      val cfg = Ingest.Config(root, "2026-03-05", "run-http",
        apiKey = Some("secret"), rateLimitMs = 0)
      val ids = Ingest.fetchTmdbSnapshot(new Ingest.HttpFetcher(), cfg,
        sleeper = _ => (),
        popularUrl = s"$base/3/movie/popular",
        detailsUrlOf = id => s"$base/3/movie/$id")
      assert(ids == Seq(101L, 102L))
      // the files written over the real transport feed the engine directly
      val det = graft.io.RawZone.readEnveloped(spark, root, "tmdb", "details",
        "2026-03-05", graft.model.Schemas.detailsSchema, multiLine = true)
      assert(det.select("data.id").as[Long].collect().sorted.toSeq == Seq(101L, 102L))
      assert(det.select("_meta.run_id").distinct().head().getString(0) == "run-http")
    }
  }

  test("fetchOmdbSnapshot: per-imdb-id files readable by the engine, empties skipped") {
    val root = Files.createTempDirectory("graft_ingest_omdb").toString
    val cfg = Ingest.Config(root, "2026-03-05", "run1", apiKey = Some("k"))
    val fetcher = new FixtureFetcher
    val fetched = Ingest.fetchOmdbSnapshot(fetcher, cfg,
      Seq("tt0101", "", "tt0102"), sleeper = _ => ())
    assert(fetched == Seq("tt0101", "tt0102"))
    assert(fetcher.calls.head._2 == Map("apikey" -> "k", "i" -> "tt0101"))
    val omdb = graft.io.RawZone.readEnveloped(spark, root, "omdb", "ratings",
      "2026-03-05", graft.model.Schemas.omdbSchema, multiLine = true)
    assert(omdb.count() == 2)
    // the file stem carries the imdb_id key (`load_raw_to_postgres.py:179`)
    assert(omdb.select(graft.io.RawZone.srcFileStem).as[String]
      .collect().sorted.toSeq == Seq("tt0101", "tt0102"))
  }
}
