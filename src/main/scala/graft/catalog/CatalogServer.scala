package graft.catalog

import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentHashMap

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.json.JsonMapper
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** The serving half of S8: exposes any local [[Catalog]] over the REST
  * protocol [[CloudCatalog]] speaks (the reference only ships the client
  * — its server is the hosted product; the protocol is reconstructed
  * from the client's calls, cloud.py:60-93,183-361).
  *
  * Deliberately JDK-only (`com.sun.net.httpserver`): it is a metadata
  * service measured in requests per minute, not a data path — catalog
  * documents are a few KB however big the feature data grows, so one
  * single-threaded server instance covers a whole cluster's drivers.
  *
  * Auth mirrors the discovery + refresh-token flow the client expects:
  * `GET /v1/` advertises `token_url`/`client_id`; `POST /v1/token`
  * exchanges a configured refresh token for a short-lived access token;
  * every other route requires `Authorization: <access token>`.
  */
class CatalogServer(
    catalog: CatalogApi,
    refreshTokens: Set[String],
    tokenTtlMs: Long = 3600 * 1000L) {

  private val mapper = JsonMapper.builder().addModule(DefaultScalaModule).build()
  private val accessTokens = new ConcurrentHashMap[String, Long]() // token -> expiry ms

  private val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
  server.createContext("/v1/", route _)
  server.start()

  def port: Int = server.getAddress.getPort
  def url: String = s"http://127.0.0.1:$port"
  def stop(): Unit = server.stop(0)

  private def route(ex: HttpExchange): Unit = {
    try {
      val path = ex.getRequestURI.getPath.stripPrefix("/v1").stripPrefix("/").stripSuffix("/")
      (ex.getRequestMethod, path) match {
        case ("GET", "") => respond(ex, 200, Map(
          "token_url" -> s"$url/v1/token",
          "login_url" -> s"$url/v1/login",       // interactive flow: not served
          "callback_url" -> s"$url/v1/callback", // (cloud.py:79-90)
          "client_id" -> "graft-catalog"))
        case ("POST", "token") => grantToken(ex)
        case (method, entity) =>
          if (!authorized(ex)) respond(ex, 401, Map("message" -> "invalid or expired token"))
          else handle(ex, method, entity)
      }
    } catch {
      case e: graft.api.MissingFeatureException => respond(ex, 404, Map("message" -> e.getMessage))
      case e: NoSuchElementException  => respond(ex, 404, Map("message" -> e.getMessage))
      case e: IllegalArgumentException => respond(ex, 400, Map("message" -> e.getMessage))
      case e: Exception => respond(ex, 500, Map("message" -> String.valueOf(e.getMessage)))
    } finally ex.close()
  }

  private def grantToken(ex: HttpExchange): Unit = {
    val form = new String(ex.getRequestBody.readAllBytes(), UTF_8)
    val params = form.split("&").iterator.map(_.split("=", 2)).collect {
      case Array(k, v) => k -> java.net.URLDecoder.decode(v, UTF_8)
    }.toMap
    if (params.get("grant_type").contains("refresh_token") &&
        params.get("refresh_token").exists(refreshTokens.contains)) {
      val token = java.util.UUID.randomUUID().toString
      accessTokens.put(token, System.currentTimeMillis() + tokenTtlMs)
      respond(ex, 200, Map("access_token" -> token,
        "expires_in" -> math.max(1, tokenTtlMs / 1000), "token_type" -> "Bearer"))
    } else respond(ex, 400, Map("message" -> "invalid refresh token"))
  }

  private def authorized(ex: HttpExchange): Boolean = {
    val header = Option(ex.getRequestHeaders.getFirst("Authorization"))
    header.exists { t =>
      val exp = accessTokens.getOrDefault(t, 0L)
      exp > System.currentTimeMillis()
    }
  }

  private def handle(ex: HttpExchange, method: String, entity: String): Unit = {
    lazy val body: JsonNode = mapper.readTree(ex.getRequestBody.readAllBytes())
    lazy val params: Map[String, String] =
      Option(ex.getRequestURI.getRawQuery).iterator.flatMap(_.split("&"))
        .map(_.split("=", 2)).collect {
          case Array(k, v) => k -> java.net.URLDecoder.decode(v, UTF_8)
        }.toMap

    (method, entity) match {
      case ("GET", "namespace") =>
        respond(ex, 200, catalog.listNamespaces(params.get("regex")))
      case ("POST", "namespace") =>
        catalog.createNamespace(mapper.treeToValue(body, classOf[Namespace]))
        respond(ex, 200, Map("status" -> "ok"))
      case ("PATCH", "namespace") =>
        catalog.updateNamespace(str(body, "name").get,
          description = str(body, "description"),
          meta = metaPatch(body),
          storageOptions = strMap(body, "storageOptions"))
        respond(ex, 200, Map("status" -> "ok"))
      case ("DELETE", "namespace") =>
        catalog.deleteNamespace(str(body, "name").get)
        respond(ex, 200, Map("status" -> "ok"))

      case ("GET", "feature") =>
        respond(ex, 200, catalog.listFeatures(params.get("namespace"), params.get("regex")))
      case ("POST", "feature") =>
        catalog.createFeature(mapper.treeToValue(body, classOf[Feature]))
        respond(ex, 200, Map("status" -> "ok"))
      case ("POST", "feature/bulk") =>
        catalog.createFeatures(
          mapper.treeToValue(body, classOf[Array[Feature]]).toSeq)
        respond(ex, 200, Map("status" -> "ok"))
      case ("PATCH", "feature") =>
        catalog.updateFeature(str(body, "namespace").get, str(body, "name").get,
          description = str(body, "description"),
          meta = metaPatch(body),
          transform = Option(body.get("transform")).filterNot(_.isNull)
            .map(mapper.treeToValue(_, classOf[TransformSpec])),
          valueType = str(body, "valueType"))
        respond(ex, 200, Map("status" -> "ok"))
      case ("DELETE", "feature") =>
        catalog.deleteFeature(str(body, "namespace").get, str(body, "name").get)
        respond(ex, 200, Map("status" -> "ok"))
      case ("POST", "feature/pin") =>
        catalog.pinValueType(str(body, "namespace").get, str(body, "name").get,
          str(body, "valueType").get)
        respond(ex, 200, Map("status" -> "ok"))

      case _ => respond(ex, 404, Map("message" -> s"no route: $method /v1/$entity"))
    }
  }

  /** `{"k": "v", "gone": null}` → `Map(k -> Some(v), gone -> None)` —
    * the catalog's None-delete meta patch (_model.py:58-68).
    */
  private def metaPatch(body: JsonNode): Map[String, Option[String]] =
    Option(body.get("meta")).filterNot(_.isNull).map { m =>
      m.fields().asScala.map { e =>
        e.getKey -> (if (e.getValue.isNull) None else Some(e.getValue.asText))
      }.toMap
    }.getOrElse(Map.empty)

  private def strMap(body: JsonNode, field: String): Option[Map[String, String]] =
    Option(body.get(field)).filterNot(_.isNull).map { m =>
      m.fields().asScala.map(e => e.getKey -> e.getValue.asText).toMap
    }

  private def str(body: JsonNode, field: String): Option[String] =
    Option(body.get(field)).filterNot(_.isNull).map(_.asText)

  private def respond(ex: HttpExchange, status: Int, payload: Any): Unit = {
    val bytes = mapper.writeValueAsBytes(payload)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(status, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.getResponseBody.close()
  }

  private implicit class JIter[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = new Iterator[A] {
      def hasNext = it.hasNext; def next() = it.next()
    }
  }
}
