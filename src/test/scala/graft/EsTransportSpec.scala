package graft

import scala.collection.mutable

import org.apache.spark.sql.functions._

import graft.io.{EsTransport, ServingSink}
import graft.io.EsTransport.{Config, EsResponse, HttpEsClient}

/** Live ES transport (S12/S13 over HTTP) against an in-process HTTP
  * server with the REAL HttpEsClient: mapping bootstrap 200-skip /
  * 404-create, `_bulk` per-item error surfacing (first 5, fail on any),
  * 429 linear-backoff retry, and the partition-parallel bulk path
  * shipping the exact dry-run payload bytes. */
class EsTransportSpec extends SparkSpec {
  import spark.implicits._
  import FakeEs.withEs

  private def moviesFrame = Seq(
    (101L, Some("tt0101"), Some(7.5), "2026-02-18"),
    (102L, None, None, "2026-02-18"),
    (103L, Some("tt0103"), Some(6.0), "2026-02-18"),
    (104L, Some("tt0104"), Some(5.5), "2026-02-18"),
    (105L, Some("tt0105"), Some(8.1), "2026-02-18")
  ).toDF("tmdb_id", "imdb_id", "imdb_rating", "snapshot_date")
    .withColumn("snapshot_date", to_date(col("snapshot_date")))

  test("ping surfaces the cluster version; createIndexIfMissing is 200-skip/404-create") {
    withEs { (base, es) =>
      val client = new HttpEsClient()
      val cfg = Config(base)
      assert(EsTransport.ping(client, cfg) == "8.9.9-test")
      val mapping = ServingSink.mappingJson(moviesFrame, ServingSink.movieFieldSpec)
      // 404 → PUT with the exact ServingSink mapping body
      assert(EsTransport.createIndexIfMissing(client, cfg, "movies", mapping))
      assert(es.indexes("movies") == mapping)
      // 200 → skip, mapping untouched
      es.indexes("movies") = "sentinel"
      assert(!EsTransport.createIndexIfMissing(client, cfg, "movies", mapping))
      assert(es.indexes("movies") == "sentinel")
    }
  }

  test("bulkPost: per-item errors fail the run, first 5 reported") {
    withEs { (base, es) =>
      val client = new HttpEsClient()
      val cfg = Config(base)
      // happy path: errors:false accepted silently
      EsTransport.bulkPost(client, cfg, "{}\n{}\n")
      assert(es.bulks.size == 1)
      // 7 item errors → RuntimeException carrying exactly the first 5
      val items = (1 to 7).map(i =>
        s"""{"index":{"_id":"$i","status":400,"error":{"type":"mapper_parsing_exception","reason":"err$i"}}}""")
        .mkString("[", ",", "]")
      es.bulkResponse = s"""{"errors":true,"items":$items}"""
      val e = intercept[RuntimeException] {
        EsTransport.bulkPost(client, cfg, "{}\n{}\n")
      }
      assert(e.getMessage.contains("err1") && e.getMessage.contains("err5"))
      assert(!e.getMessage.contains("err6"))
      // a mix of ok and failed items still fails (any error is fatal)
      es.bulkResponse =
        """{"errors":true,"items":[{"index":{"_id":"a","status":201}},""" +
          """{"index":{"_id":"b","status":400,"error":{"reason":"only bad"}}}]}"""
      val e2 = intercept[RuntimeException] {
        EsTransport.bulkPost(client, cfg, "{}\n{}\n")
      }
      assert(e2.getMessage.contains("only bad"))
    }
  }

  test("bulkLines: NaN doubles null out; special characters in ids stay JSON-framed") {
    // review r12: NaN serialized as the STRING "NaN" (ES rejects it for
    // a double field), and a quote/newline in an id corrupted the
    // hand-framed action line, shifting every later action/doc pairing
    val df = Seq(
      (1L, Double.NaN, "plain"),
      (2L, 7.5, "he said \"hi\"\nback\\slash")
    ).toDF("tmdb_id", "imdb_rating", "title")
    val lines = ServingSink.bulkLines(df, "movies", Seq("title"))
      .collect().map(_.getString(0))
    val nanPair = lines.find(_.contains("\"tmdb_id\":1")).get
    assert(nanPair.contains("\"imdb_rating\":null"),
      s"NaN must serialize as JSON null: $nanPair")
    assert(!nanPair.contains("NaN"), s"raw NaN leaked: $nanPair")
    val escPair = lines.find(_.contains("\"tmdb_id\":2")).get
    val action = escPair.linesIterator.next()
    // the action line must be EXACTLY one valid JSON object
    assert(action ==
      """{"index":{"_index":"movies","_id":"he said \"hi\"\nback\\slash"}}""",
      s"id not JSON-escaped: $action")
    assert(escPair.linesIterator.size == 2,
      "an embedded newline must not split the NDJSON framing")
  }

  test("Config rejects non-positive retry/chunk knobs loudly") {
    intercept[IllegalArgumentException] { Config("http://x", maxAttempts = 0) }
    intercept[IllegalArgumentException] { Config("http://x", chunkDocs = 0) }
    intercept[IllegalArgumentException] { Config("http://x", maxLocalDocs = 0) }
  }

  test("bulkIndexLocal fails fast past maxLocalDocs and points at bulkIndexFrame") {
    withEs { (base, es) =>
      val client = new HttpEsClient()
      val cfg = Config(base, maxLocalDocs = 10)
      // within the cap: normal local path
      assert(EsTransport.bulkIndexLocal(client, cfg, moviesFrame,
        "movies", Seq("tmdb_id")) == 5L)
      // over the cap: require fires BEFORE materializing the frame
      val big = spark.range(1000).select(col("id").as("tmdb_id"))
      val e = intercept[IllegalArgumentException] {
        EsTransport.bulkIndexLocal(client, cfg, big, "movies", Seq("tmdb_id"))
      }
      assert(e.getMessage.contains("bulkIndexFrame"),
        s"guard must point at the partition-parallel path: ${e.getMessage}")
      assert(es.bulks.size == 1, "the over-limit frame must not reach the wire")
    }
  }

  test("the existence probe retries 429s like every other exchange") {
    withEs { (base, es) =>
      val client = new HttpEsClient()
      val cfg = Config(base, maxAttempts = 3, backoffMs = 10)
      es.probe429Left = 2
      val sleeps = mutable.Buffer[Long]()
      // two 429s on the GET probe, then a clean 404 → PUT proceeds
      assert(EsTransport.createIndexIfMissing(client, cfg, "movies", "{}",
        sleeps.append(_)))
      assert(sleeps.toSeq == Seq(10L, 20L))
      assert(es.indexes.contains("movies"))
      // exhausted retries surface as a loud probe failure
      es.probe429Left = 99
      intercept[java.io.IOException] {
        EsTransport.createIndexIfMissing(client, cfg, "movies2", "{}", _ => ())
      }
    }
  }

  test("bulk errors surface for create/update/delete actions, not only index") {
    withEs { (base, es) =>
      val client = new HttpEsClient()
      es.bulkResponse =
        """{"errors":true,"items":[{"create":{"_id":"a","status":409,"error":{"reason":"version conflict"}}},""" +
          """{"update":{"_id":"b","status":404,"error":{"reason":"missing doc"}}}]}"""
      val e = intercept[RuntimeException] {
        EsTransport.bulkPost(client, Config(base), "{}\n{}\n")
      }
      assert(e.getMessage.contains("version conflict"))
      assert(e.getMessage.contains("missing doc"))
    }
  }

  test("429 responses retry with linear backoff; other statuses fail fast") {
    withEs { (base, es) =>
      val client = new HttpEsClient()
      val cfg = Config(base, maxAttempts = 3, backoffMs = 50)
      es.bulk429Left = 2
      val sleeps = mutable.Buffer[Long]()
      EsTransport.bulkPost(client, cfg, "{}\n{}\n", sleeps.append(_))
      assert(sleeps.toSeq == Seq(50L, 100L)) // two 429s, then accepted
      assert(es.bulks.size == 1)
      // non-429 HTTP error: immediate failure, no retries
      val e = intercept[java.io.IOException] {
        EsTransport.sendWithRetry(client, cfg, "PATCH", s"$base/x", None,
          "application/json", _ => fail("must not retry"))
      }
      assert(e.getMessage.contains("HTTP 400"))
    }
  }

  test("bulkIndexFrame ships the exact dry-run payload, chunked, partition-parallel") {
    withEs { (base, es) =>
      val cfg = Config(base, chunkDocs = 2)
      val sent = EsTransport.bulkIndexFrame(moviesFrame, "movies_enriched_daily",
        Seq("snapshot_date", "tmdb_id"), cfg)
      assert(sent == 5L)
      // every chunk ≤ 2 docs (4 lines), payload newline-terminated
      assert(es.bulks.forall(p => p.endsWith("\n") &&
        p.split("\n").length <= 4))
      // reassembled lines == the dry-run payload lines, exactly
      val received = es.bulks.flatMap(_.split("\n").filter(_.nonEmpty)).sorted
      val expected = ServingSink.bulkLines(moviesFrame, "movies_enriched_daily",
          Seq("snapshot_date", "tmdb_id"))
        .collect().flatMap(_.getString(0).split("\n")).sorted.toSeq
      assert(received.toSeq == expected)
      // stable ids and explicit nulls crossed the wire
      assert(received.exists(_.contains(""""_id":"2026-02-18_102"""")))
      assert(received.exists(_.contains(""""imdb_id":null""")))
    }
  }

  test("indexDay: ping + both mappings bootstrapped + both frames bulked") {
    withEs { (base, es) =>
      val kpi = Seq(("2026-02-18", 5L)).toDF("snapshot_date", "nb_movies")
        .withColumn("snapshot_date", to_date(col("snapshot_date")))
      val (nMovies, nKpis) = EsTransport.indexDay(new HttpEsClient(), Config(base),
        moviesFrame, kpi)
      assert(nMovies == 5L && nKpis == 1L)
      assert(es.indexes.keySet == Set("movies_enriched_daily", "movies_kpis_daily"))
      // the KPI mapping carries the reference's integer pins
      assert(es.indexes("movies_kpis_daily").contains(""""nb_movies":{"type":"integer"}"""))
      val allLines = es.bulks.flatMap(_.split("\n").filter(_.nonEmpty))
      assert(allLines.count(_.startsWith("""{"index":""")) == 6) // 5 movies + 1 kpi
    }
  }

  test("malformed _bulk bodies fail with a bounded one-line diagnosis, never a parser stack") {
    withEs { (base, es) =>
      val client = new HttpEsClient()
      val cfg = Config(base)
      // non-JSON 200 (a proxy error page behind a 2xx): the errors flag is
      // unreadable, so the chunk FAILS — loudly, with the body prefix
      es.bulkResponse = "<html>502 bad gateway</html>"
      val e1 = intercept[java.io.IOException](EsTransport.bulkPost(client, cfg, "{}\n"))
      assert(e1.getMessage.contains("unparseable body"))
      assert(e1.getMessage.contains("<html>502"))
      // truncated JSON stream mid-items
      es.bulkResponse = """{"errors":true,"items":[{"index":{"_id":"1","error":{"ty"""
      val e2 = intercept[java.io.IOException](EsTransport.bulkPost(client, cfg, "{}\n"))
      assert(e2.getMessage.contains("unparseable body"))
      // empty body behind a 200
      es.bulkResponse = ""
      val e3 = intercept[java.io.IOException](EsTransport.bulkPost(client, cfg, "{}\n"))
      assert(e3.getMessage.contains("unparseable body"))
      // a thousand failed items with 10 KB reasons each: the exception
      // message stays bounded (first 5 errors, 500 chars each)
      val pad = "x" * 10000
      val items = (1 to 1000).map(i =>
        s"""{"index":{"_id":"$i","status":400,"error":{"type":"boom","reason":"r$i $pad"}}}""")
        .mkString("[", ",", "]")
      es.bulkResponse = s"""{"errors":true,"items":$items}"""
      val e4 = intercept[RuntimeException](EsTransport.bulkPost(client, cfg, "{}\n"))
      assert(e4.getMessage.contains("boom"))
      assert(e4.getMessage.length < 5000, s"message not bounded: ${e4.getMessage.length}")
    }
  }

  test("ping tolerates a non-JSON 200 body: reachable host, unknown version") {
    withEs { (base, es) =>
      es.pingResponse = "everything is fine (but this is not json)"
      assert(EsTransport.ping(new HttpEsClient(), Config(base)) == "unknown")
      es.pingResponse = """{"version":"flat-string-not-object"}"""
      assert(EsTransport.ping(new HttpEsClient(), Config(base)) == "unknown")
    }
  }
}
