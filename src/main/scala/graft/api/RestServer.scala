package graft.api

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.search.SearchFilters
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** SURVEY §2 I — the reference's REST transport (FastAPI routes,
  * reference: src/api/server.py:118-513; request/response bounds:
  * src/api/models.py:55-280) as a thin façade over [[EmailEtlApi]].
  *
  * Built entirely on the JDK's `com.sun.net.httpserver` plus the json4s
  * that ships with Spark — zero added dependencies, per the environment
  * contract. The server is a transport only: every route body is one
  * [[EmailEtlApi]] call (itself one Catalyst plan + the documented ≤20-row
  * driver boundary), and `DataFrame → JSON` uses Spark's own `toJSON` so
  * row serialization stays in the engine.
  *
  * Routes mirrored (names, defaults, clamps follow the reference):
  *  - GET  /health                 → {"status": "healthy"}
  *  - GET  /api/status             → totals + per-provider stats
  *  - POST /api/search/emails      → {query, results: [EmailSummary], total_found}
  *  - POST /api/search/ask         → {question, answer, sources, context_email_count}
  *  - POST /api/analyze/categorize → [{...category rows}]
  *  - POST /api/analyze/actions    → [{...action rows}]
  *  - GET  /mcp/tools              → MCP server info + tool definitions
  *  - POST /mcp/call               → {tool, parameters} → {tool, result}
  * Errors return FastAPI's shape: {"detail": msg} with 400/404/405/500.
  *
  * Out of scope (documented in COVERAGE.md): the import/sync background
  * task routes (server.py:137-282) — batch ingest is the CLI/streaming
  * surface here — and OAuth, which is environment-excluded.
  */
object RestServer {
  implicit private val formats: Formats = DefaultFormats

  /** Start serving `api` on 127.0.0.1:`port` (port 0 = ephemeral, for
    * tests). Single-threaded executor: requests serialize, which matches
    * Spark's driver-side session threading contract. */
  def start(api: EmailEtlApi, port: Int = 8000): HttpServer = {
    val srv = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", port), 0)

    route(srv, "/health", "GET") { _ =>
      JObject("status" -> JString("healthy"))
    }

    route(srv, "/api/status", "GET") { _ =>
      val totals = dfJson(api.status()).headOption.getOrElse(JObject())
      JObject(
        "database" -> totals,
        "providers" -> JArray(dfJson(api.providerStats()).toList))
    }

    route(srv, "/api/search/emails", "POST") { body =>
      val query = (body \ "query").extractOpt[String]
        .getOrElse(throw BadRequest("missing field: query"))
      val limit = (body \ "limit").extractOpt[Int].getOrElse(10)
      val filters = SearchFilters(
        dateFrom = ts(body \ "date_from"), dateTo = ts(body \ "date_to"))
      val includeContent = (body \ "include_content").extractOpt[Boolean]
        .getOrElse(false)
      val hits = api.searchSemantic(query, limit, filters)
      // EmailSummary shape (models.py:133-151): rejoin the store for the
      // summary fields the ranked projection doesn't carry;
      // include_content additionally attaches the full plain body
      val extra = Seq("sender_name", "has_attachments", "labels",
        "markdown_path") ++ (if (includeContent) Seq("body_plain") else Nil)
      val summaries = hits
        .join(api.emails.select((Seq("id") ++ extra).map(col): _*), Seq("id"))
        .select((Seq("id", "message_id", "subject", "sender", "sender_name",
          "date", "has_attachments", "labels", "similarity", "markdown_path") ++
          (if (includeContent) Seq("body_plain") else Nil) ++
          Seq("score")).map(col): _*)
        .orderBy(col("score").desc, col("message_id"))
        .drop("score")
      val rows = dfJson(summaries)
      JObject(
        "query" -> JString(query),
        "results" -> JArray(rows.toList),
        "total_found" -> JInt(rows.size))
    }

    route(srv, "/api/search/ask", "POST") { body =>
      val question = (body \ "question").extractOpt[String]
        .getOrElse(throw BadRequest("missing field: question"))
      val k = (body \ "context_limit").extractOpt[Int].getOrElse(5)
      val (answer, sourceIds) = api.ask(question, k)
      val sources =
        if (sourceIds.isEmpty) Nil
        else dfJson(api.emails
          .filter(col("message_id").isin(sourceIds.map(x => x: Any): _*))
          .select("id", "message_id", "subject", "sender", "sender_name", "date")
          .orderBy("message_id"))
      JObject(
        "question" -> JString(question),
        "answer" -> JString(answer),
        "sources" -> JArray(sources.toList),
        "context_email_count" -> JInt(sourceIds.size))
    }

    route(srv, "/api/analyze/categorize", "POST") { body =>
      val limit = (body \ "limit").extractOpt[Int].getOrElse(10)
      JArray(dfJson(api.categorize(limit)).toList)
    }

    route(srv, "/api/analyze/actions", "POST") { body =>
      val days = (body \ "days").extractOpt[Int].getOrElse(7)
      val limit = (body \ "limit").extractOpt[Int].getOrElse(50)
      JArray(dfJson(api.extractActions(days, limit)).toList)
    }

    route(srv, "/mcp/tools", "GET") { _ => McpTools.definitions }

    route(srv, "/mcp/call", "POST") { body =>
      val tool = (body \ "tool").extractOpt[String]
        .getOrElse(throw BadRequest("missing field: tool"))
      try JObject("tool" -> JString(tool),
        "result" -> McpTools.dispatch(api, tool, body \ "parameters"))
      catch { case McpTools.McpError(m) => throw BadRequest(m) }
    }

    srv.setExecutor(null) // serve on the dispatch thread
    srv.start()
    srv
  }

  private final case class BadRequest(msg: String) extends RuntimeException(msg)

  private def dfJson(df: DataFrame): Seq[JValue] = Json.rows(df)

  private def ts(v: JValue): Option[java.sql.Timestamp] =
    try Json.timestamp(v)
    catch { case e: IllegalArgumentException => throw BadRequest(e.getMessage) }

  private def route(srv: HttpServer, path: String, method: String)(
      handler: JValue => JValue): Unit =
    srv.createContext(path, (ex: HttpExchange) => {
      try {
        if (ex.getRequestURI.getPath != path) {
          reply(ex, 404, JObject("detail" -> JString("Not Found")))
        } else if (ex.getRequestMethod != method) {
          reply(ex, 405, JObject("detail" -> JString("Method Not Allowed")))
        } else {
          val raw = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
          val body = if (raw.isEmpty) JNothing else JsonMethods.parse(raw)
          reply(ex, 200, handler(body))
        }
      } catch {
        case BadRequest(m) => reply(ex, 400, JObject("detail" -> JString(m)))
        case e: Throwable =>
          reply(ex, 500, JObject("detail" -> JString(
            Option(e.getMessage).getOrElse(e.getClass.getSimpleName))))
      } finally ex.close()
    })

  private def reply(ex: HttpExchange, code: Int, body: JValue): Unit = {
    val bytes = JsonMethods.compact(JsonMethods.render(body)).getBytes("UTF-8")
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
  }
}
