package graft.api

import java.net.{InetSocketAddress, URLDecoder}
import java.nio.charset.StandardCharsets
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession
import graft.backend.QueueBackend

/** The console mounted on a real socket: [[ConsoleRoutes]] behind the
  * JDK's built-in `com.sun.net.httpserver` (no new dependency — the
  * server ships with Java). Routing, parameter shapes, and JSON bodies
  * are exactly the pure `handle` contract (reference
  * redis/console.clj:11-48 serves the same tree behind ring/jetty);
  * this class only adapts wire ↔ [[ConsoleRequest]]/[[ConsoleResponse]].
  *
  * Console traffic is human-scale (a dashboard poll, an operator click),
  * so requests serve sequentially on the dispatch thread; every request
  * runs a driver-side Spark action, which is the console's nature — none
  * of the data-plane paths go through here.
  */
final class ConsoleServer(
    backend: QueueBackend,
    spark: SparkSession,
    bindPort: Int = 0) {

  private val routes = new ConsoleRoutes(backend, spark)
  private val html = new ConsoleHtml(backend, spark)
  private val server =
    HttpServer.create(new InetSocketAddress("127.0.0.1", bindPort), 0)

  server.createContext("/", (ex: HttpExchange) => {
    val path = ex.getRequestURI.getPath
    // `/console/*` serves the server-rendered pages (reference
    // console.clj `app-handler` mounts the hiccup views the same way,
    // at a route prefix beside the data handlers); everything else is
    // the JSON route table.
    val htmlPage = Option(path)
      .filter(p => p == "/console" || p.startsWith("/console/"))
      .map { p =>
        val sub = p.stripPrefix("/console")
        try html.handle(ConsoleRequest(
            ex.getRequestMethod.toUpperCase, if (sub.isEmpty) "/" else sub,
            params(ex)))
          .getOrElse(ConsoleResponse(404, "<!DOCTYPE html><html><body><h1>not found</h1></body></html>"))
        catch {
          case e: Throwable =>
            ConsoleResponse(500, s"<!DOCTYPE html><html><body><h1>error</h1><pre>${e.toString
              .replace("&", "&amp;").replace("<", "&lt;")}</pre></body></html>")
        }
      }
    val resp = htmlPage.getOrElse {
      try routes.handle(ConsoleRequest(
        ex.getRequestMethod.toUpperCase, path, params(ex)))
      catch { // handle() maps known faults to 400; anything else is a 500
        case e: Throwable =>
          ConsoleResponse(500, s"""{"error":${ConsoleServer.jstr(e.toString)}}""")
      }
    }
    val contentType =
      if (htmlPage.isDefined) "text/html; charset=utf-8"
      else "application/json; charset=utf-8"
    val bytes = resp.body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.add("Content-Type", contentType)
    resp.headers.foreach { case (k, v) => ex.getResponseHeaders.add(k, v) }
    ex.sendResponseHeaders(resp.status, bytes.length)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  })
  server.setExecutor(null)

  /** Start serving; returns the bound port (ephemeral when bindPort=0). */
  def start(): Int = { server.start(); server.getAddress.getPort }

  def stop(): Unit = server.stop(0)

  /** Query params, merged with an `application/x-www-form-urlencoded`
    * POST body (the shape HTML forms submit; body wins on key clash —
    * same precedence as ring's wrap-params in the reference). */
  private def params(ex: HttpExchange): Map[String, String] = {
    val query = Option(ex.getRequestURI.getRawQuery).getOrElse("")
    val body =
      if (ex.getRequestMethod.equalsIgnoreCase("POST") &&
          Option(ex.getRequestHeaders.getFirst("Content-Type"))
            .exists(_.startsWith("application/x-www-form-urlencoded")))
        new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      else ""
    decodePairs(query) ++ decodePairs(body)
  }

  private def decodePairs(encoded: String): Map[String, String] =
    encoded.split('&').filter(_.nonEmpty).map { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => dec(k) -> dec(v)
        case Array(k) => dec(k) -> ""
      }
    }.toMap

  private def dec(s: String): String = URLDecoder.decode(s, "UTF-8")
}

private object ConsoleServer {
  def jstr(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
