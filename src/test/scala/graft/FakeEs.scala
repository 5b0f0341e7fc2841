package graft

import scala.collection.mutable

/** Shared in-process fake Elasticsearch for transport tests: version
  * ping, index registry (GET 200/404, PUT create), `_bulk` capture with
  * scriptable responses and a 429 budget. Used with the REAL
  * `HttpEsClient`, so the full wire protocol is exercised. */
class FakeEs(server: com.sun.net.httpserver.HttpServer) {
  val indexes = mutable.Map[String, String]() // index -> mapping body
  val bulks = mutable.Buffer[String]() // captured _bulk payloads
  var pingResponse: String = """{"version":{"number":"8.9.9-test"}}"""
  var bulkResponse: String = """{"errors":false,"items":[]}"""
  var bulk429Left = 0 // serve this many 429s before accepting
  var probe429Left = 0 // serve this many 429s on GET /<index> probes

  server.createContext("/", ex => {
    val path = ex.getRequestURI.getPath
    val method = ex.getRequestMethod
    val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
    val (code, resp) = synchronized {
      (method, path) match {
        case ("GET", "/") => (200, pingResponse)
        case ("POST", "/_bulk") =>
          if (bulk429Left > 0) { bulk429Left -= 1; (429, "slow down") }
          else { bulks.append(body); (200, bulkResponse) }
        case ("GET", p) =>
          val idx = p.stripPrefix("/")
          if (probe429Left > 0) { probe429Left -= 1; (429, "slow down") }
          else if (indexes.contains(idx)) (200, s"""{"$idx":{}}""") else (404, "")
        case ("PUT", p) =>
          indexes(p.stripPrefix("/")) = body; (200, """{"acknowledged":true}""")
        case _ => (400, "bad")
      }
    }
    val b = resp.getBytes("UTF-8")
    ex.sendResponseHeaders(code, if (b.isEmpty) -1 else b.length.toLong)
    if (b.nonEmpty) ex.getResponseBody.write(b)
    ex.close()
  })
}

object FakeEs {
  def withEs(test: (String, FakeEs) => Unit): Unit = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val es = new FakeEs(server)
    server.start()
    try test(s"http://127.0.0.1:${server.getAddress.getPort}", es)
    finally server.stop(0)
  }
}
