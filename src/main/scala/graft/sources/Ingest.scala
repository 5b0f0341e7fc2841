package graft.sources

import java.nio.file.{Files, Paths}

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Live-ingestion adapter (SURVEY.md §2.1 S1–S3): the reference's fetch
  * stage is a driver-side loop — GET the popular page, then one details
  * GET per movie id with a rate-limit sleep, each response saved as a
  * pretty-printed enveloped JSON file under the raw zone
  * (`scripts/ingest/fetch_tmdb.py:49-74`, envelope `:30-43`).
  *
  * The loop, retry policy, rate limiting, id extraction, and raw-zone
  * layout are real here; the HTTP client is the pluggable [[Fetcher]]
  * seam (this container has no egress, so tests drive the loop with a
  * fixture-backed fetcher — a production deployment drops in a
  * `requests`-equivalent client and nothing else changes). The output is
  * bit-compatible with `RawZone.readEnveloped(multiLine = true)`, so the
  * adapter feeds the engine's pipeline directly.
  *
  * Scale note: this is an ingestion ADAPTER, not an engine operator — the
  * loop is bounded by the upstream API's rate limit (20 movies/day in the
  * reference), not by data volume; bulk data enters the engine through
  * the raw/lake zone readers.
  */
object Ingest {

  /** One HTTP GET: url + query params → response body. Implementations
    * throw on transport/HTTP errors; the loop retries with backoff. */
  trait Fetcher {
    def get(url: String, params: Map[String, String]): String
  }

  /** Production transport for the [[Fetcher]] seam: a `java.net.http`
    * GET with URL-encoded query params. Any non-2xx status throws (the
    * reference's `raise_for_status`, `fetch_tmdb.py:55,70`), so
    * [[getWithRetry]] sees HTTP and transport failures uniformly and
    * applies the same linear-backoff retry to both — a 429 rate-limit
    * response is retried like a dropped connection, a persistent 4xx/5xx
    * exhausts `maxAttempts` and propagates.
    *
    * Driver-side only by design (the fetch loop is an ingestion adapter,
    * not a distributed operator), so the client is a plain field — nothing
    * here ships to executors. */
  final class HttpFetcher(connectTimeoutMs: Long = 5000,
                          requestTimeoutMs: Long = 15000) extends Fetcher {
    private val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofMillis(connectTimeoutMs))
      .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
      .build()

    private def enc(s: String): String =
      java.net.URLEncoder.encode(s, java.nio.charset.StandardCharsets.UTF_8)

    override def get(url: String, params: Map[String, String]): String = {
      val qs = params.map { case (k, v) => s"${enc(k)}=${enc(v)}" }.mkString("&")
      val full =
        if (qs.isEmpty) url
        else url + (if (url.contains("?")) "&" else "?") + qs
      val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(full))
        .timeout(java.time.Duration.ofMillis(requestTimeoutMs))
        .GET().build()
      val resp = client.send(req,
        java.net.http.HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() / 100 != 2)
        throw new java.io.IOException(
          s"HTTP ${resp.statusCode()} for $url") // body dropped: may be huge
      resp.body()
    }
  }

  /** The reference's endpoints (`fetch_tmdb.py:20-21`). */
  val PopularUrl = "https://api.themoviedb.org/3/movie/popular"
  def detailsUrl(movieId: Long): String =
    s"https://api.themoviedb.org/3/movie/$movieId"

  case class Config(
      outRoot: String,
      snapshotDate: String,
      runId: String,
      /** `language=fr-FR` on both endpoints (`fetch_tmdb.py:52,66`). */
      language: String = "fr-FR",
      apiKey: Option[String] = None,
      /** `time.sleep(0.25)` between detail GETs (`fetch_tmdb.py:74`). */
      rateLimitMs: Long = 250,
      /** Beyond-reference robustness: the reference fails the whole run on
        * one bad response (`raise_for_status`); we retry transient errors
        * with linear backoff before giving up. */
      maxAttempts: Int = 3,
      backoffMs: Long = 200)

  /** GET with bounded retry; rethrows the last failure. */
  def getWithRetry(fetcher: Fetcher, url: String, params: Map[String, String],
                   cfg: Config, sleeper: Long => Unit): String = {
    var attempt = 0
    var last: Throwable = null
    while (attempt < cfg.maxAttempts) {
      try return fetcher.get(url, params)
      catch {
        case scala.util.control.NonFatal(e) =>
          last = e
          attempt += 1
          if (attempt < cfg.maxAttempts) sleeper(cfg.backoffMs * attempt)
      }
    }
    throw last
  }

  /** Wrap a raw JSON response in the `{_meta, data}` lineage envelope and
    * write it pretty-printed (`fetch_tmdb.py:30-43` `save_json`). */
  private def saveEnveloped(dir: String, file: String, body: String,
                            source: String, endpoint: String, cfg: Config): Unit = {
    val meta = JObject(
      "snapshot_date" -> JString(cfg.snapshotDate),
      "run_id" -> JString(cfg.runId),
      "extracted_at_utc" -> JString(java.time.Instant.now().toString),
      "source" -> JString(source),
      "endpoint" -> JString(endpoint))
    val payload = JObject("_meta" -> meta, "data" -> JsonMethods.parse(body))
    val d = Paths.get(dir)
    Files.createDirectories(d)
    Files.writeString(d.resolve(file), JsonMethods.pretty(JsonMethods.render(payload)))
  }

  private def datePath(cfg: Config, source: String, endpoint: String): String =
    s"${cfg.outRoot}/$source/$endpoint/date=${cfg.snapshotDate}"

  /** The TMDB fetch stage (`fetch_tmdb.py:49-74`): popular page 1 →
    * `popular_movies.json`, then one details GET per movie id →
    * `<id>.json`, rate-limited between calls; rows with a missing id are
    * skipped (`:63-64`). Returns the movie ids whose details were fetched.
    *
    * `sleeper` is injectable so tests can assert the pacing without
    * wall-clock sleeps. */
  def fetchTmdbSnapshot(fetcher: Fetcher, cfg: Config,
                        sleeper: Long => Unit = Thread.sleep,
                        popularUrl: String = PopularUrl,
                        detailsUrlOf: Long => String = detailsUrl): Seq[Long] = {
    val baseParams = cfg.apiKey.map("api_key" -> _).toMap +
      ("language" -> cfg.language)
    val popular = getWithRetry(fetcher, popularUrl,
      baseParams + ("page" -> "1"), cfg, sleeper)
    saveEnveloped(datePath(cfg, "tmdb", "popular"), "popular_movies.json",
      popular, "tmdb", "popular", cfg)

    val ids: Seq[Long] =
      (JsonMethods.parse(popular) \ "results").children.flatMap { m =>
        m \ "id" match {
          case JInt(i) => Some(i.toLong)
          case JLong(i) => Some(i)
          case _ => None // `if not movie_id: continue`
        }
      }
    ids.foreach { id =>
      val details = getWithRetry(fetcher, detailsUrlOf(id), baseParams, cfg, sleeper)
      saveEnveloped(datePath(cfg, "tmdb", "details"), s"$id.json",
        details, "tmdb", "details", cfg)
      sleeper(cfg.rateLimitMs) // `time.sleep(0.25)`, fetch_tmdb.py:74
    }
    ids
  }

  /** The OMDb fetch stage (the repo's `fetch_omdb.py` is missing; contract
    * inferred from its loader — one `<imdb_id>.json` per title under
    * `omdb/ratings/date=…`, `load_raw_to_postgres.py:160-179`). Ids come
    * from the TMDB details responses' `imdb_id` field. */
  def fetchOmdbSnapshot(fetcher: Fetcher, cfg: Config, imdbIds: Seq[String],
                        baseUrl: String = "https://www.omdbapi.com/",
                        sleeper: Long => Unit = Thread.sleep): Seq[String] = {
    val baseParams = cfg.apiKey.map("apikey" -> _).toMap
    imdbIds.filter(_.nonEmpty).map { id =>
      val body = getWithRetry(fetcher, baseUrl, baseParams + ("i" -> id), cfg, sleeper)
      saveEnveloped(datePath(cfg, "omdb", "ratings"), s"$id.json",
        body, "omdb", "ratings", cfg)
      sleeper(cfg.rateLimitMs)
      id
    }
  }
}
