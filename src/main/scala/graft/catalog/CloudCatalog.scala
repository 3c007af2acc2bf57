package graft.catalog

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Duration

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.json.JsonMapper
import com.fasterxml.jackson.module.scala.DefaultScalaModule

import graft.api.{FeatureStoreException, MissingFeatureException, RemoteFeatureStoreException}

/** S8: the hosted-catalog client (`/root/reference/bytehub/cloud.py:22-361`).
  *
  * Speaks the same shape of protocol as the reference's CloudFeatureStore:
  *  - endpoint discovery: `GET {endpoint}/v1/` returns the token URL and
  *    client id (cloud.py:60-64);
  *  - non-interactive OAuth2 refresh-token grant: `POST token_url` with
  *    `grant_type=refresh_token` returns a short-lived access token
  *    (cloud.py:66-77), re-run automatically within 10 s of expiry
  *    (cloud.py:107-123);
  *  - every API call carries `Authorization: <access_token>` and JSON
  *    bodies (cloud.py:125-131);
  *  - CRUD over `/v1/namespace` and `/v1/feature` with GET/POST/PATCH/
  *    DELETE verbs (cloud.py:183-361);
  *  - clone is CLIENT-side — fetch the source entry, strip identity
  *    fields, create the copy (cloud.py:298-322); data movement stays
  *    with the caller's `FeatureStore`, which is the reference's design:
  *    only metadata is remote, compute never leaves the cluster
  *    (cloud.py:176-181).
  *
  * This class is pure JDK `java.net.http` + Jackson — no Spark session,
  * no new dependencies — so a driver on a 1000-executor cluster pays one
  * O(ms) HTTP round-trip per metadata verb and zero per data row.
  */
class CloudCatalog(
    connectionString: String,
    refreshToken: String,
    requestTimeout: Duration = Duration.ofSeconds(10)) extends CatalogApi {

  private val mapper = JsonMapper.builder().addModule(DefaultScalaModule).build()
  private val http = HttpClient.newBuilder().connectTimeout(requestTimeout).build()

  /** `{endpoint}/v1/`, slash-terminated like the reference (cloud.py:55-59). */
  private val endpoint: String = {
    val base = connectionString.stripSuffix("/")
    if (base.contains("/v1")) base + "/" else base + "/v1/"
  }

  // ---- auth ---------------------------------------------------------

  private case class Tokens(access: String, expiresAtMs: Long)

  private val discovered: JsonNode = {
    val resp = send(HttpRequest.newBuilder(URI.create(endpoint)).GET())
    mapper.readTree(resp)
  }
  private val tokenUrl = requiredField(discovered, "token_url")
  private val clientId = requiredField(discovered, "client_id")

  @volatile private var tokens: Tokens = fetchTokens()

  private def requiredField(node: JsonNode, name: String): String =
    Option(node.get(name)).map(_.asText).getOrElse(
      throw new RemoteFeatureStoreException(
        s"catalog endpoint $endpoint discovery response missing '$name'"))

  private def fetchTokens(): Tokens = {
    val form = s"grant_type=refresh_token&refresh_token=" +
      java.net.URLEncoder.encode(refreshToken, UTF_8) +
      s"&client_id=" + java.net.URLEncoder.encode(clientId, UTF_8)
    val resp = send(HttpRequest.newBuilder(URI.create(tokenUrl))
      .header("Content-Type", "application/x-www-form-urlencoded")
      .POST(HttpRequest.BodyPublishers.ofString(form)))
    val node = mapper.readTree(resp)
    val access = requiredField(node, "access_token")
    val expiresIn = Option(node.get("expires_in")).map(_.asLong).getOrElse(3600L)
    Tokens(access, System.currentTimeMillis() + expiresIn * 1000)
  }

  /** Refresh within 10 s of expiry, like cloud.py:109. */
  private def accessToken(): String = {
    if (System.currentTimeMillis() >= tokens.expiresAtMs - 10_000) synchronized {
      if (System.currentTimeMillis() >= tokens.expiresAtMs - 10_000)
        tokens = fetchTokens()
    }
    tokens.access
  }

  // ---- transport ----------------------------------------------------

  private def send(b: HttpRequest.Builder): String = {
    val resp =
      try http.send(b.timeout(requestTimeout).build(), HttpResponse.BodyHandlers.ofString())
      catch {
        case e: java.io.IOException =>
          throw new RemoteFeatureStoreException(s"catalog request failed: ${e.getMessage}")
      }
    if (resp.statusCode() / 100 == 2) resp.body()
    else {
      // surface the server's domain error as the matching local type, so
      // callers catch the same exceptions in local and cloud mode
      val message =
        try Option(mapper.readTree(resp.body()).get("message")).map(_.asText)
          .getOrElse(resp.body())
        catch { case _: Exception => resp.body() }
      resp.statusCode() match {
        case 400 => throw new FeatureStoreException(message)
        case 404 => throw new MissingFeatureException(message)
        case s   => throw new RemoteFeatureStoreException(s"HTTP $s: $message")
      }
    }
  }

  private def call(method: String, path: String, body: Option[Any] = None,
      params: Map[String, String] = Map.empty): String = {
    val query =
      if (params.isEmpty) ""
      else "?" + params.map { case (k, v) =>
        k + "=" + java.net.URLEncoder.encode(v, UTF_8)
      }.mkString("&")
    val b = HttpRequest.newBuilder(URI.create(endpoint + path + query))
      .header("Authorization", accessToken())
      .header("Content-Type", "application/json")
    val withBody = body match {
      case Some(v) => b.method(method,
        HttpRequest.BodyPublishers.ofString(mapper.writeValueAsString(v)))
      case None => b.method(method, HttpRequest.BodyPublishers.noBody())
    }
    send(withBody)
  }

  private def exact(name: String): String = "^" + java.util.regex.Pattern.quote(name) + "$"

  // ---- namespaces (cloud.py:183-258) --------------------------------

  override def listNamespaces(regex: Option[String]): Seq[Namespace] =
    mapper.readValue(call("GET", "namespace",
        params = regex.map("regex" -> _).toMap),
      classOf[Array[Namespace]]).toSeq

  override def getNamespace(name: String): Option[Namespace] =
    listNamespaces(Some(exact(name))).headOption

  override def createNamespace(ns: Namespace): Unit =
    call("POST", "namespace", Some(ns))

  override def updateNamespace(
      name: String,
      description: Option[String],
      meta: Map[String, Option[String]],
      storageOptions: Option[Map[String, String]]): Unit =
    call("PATCH", "namespace",
      Some(Map("name" -> name, "description" -> description.orNull,
        "meta" -> meta.map { case (k, v) => k -> v.orNull },
        "storageOptions" -> storageOptions.orNull)))

  override def deleteNamespace(name: String): Unit =
    call("DELETE", "namespace", Some(Map("name" -> name)))

  // ---- features (cloud.py:260-361) ----------------------------------

  override def listFeatures(
      namespace: Option[String],
      regex: Option[String]): Seq[Feature] =
    mapper.readValue(call("GET", "feature",
        params = namespace.map("namespace" -> _).toMap ++ regex.map("regex" -> _).toMap),
      classOf[Array[Feature]]).toSeq

  override def getFeature(namespace: String, name: String): Option[Feature] =
    listFeatures(Some(namespace), Some(exact(name))).headOption

  override def createFeature(f: Feature): Unit =
    call("POST", "feature", Some(f))

  /** One round-trip, one server-side transaction for the whole batch —
    * a deployment registering thousands of features pays O(1) HTTP
    * requests and the server one document persist.
    */
  override def createFeatures(fs: Seq[Feature]): Unit =
    if (fs.nonEmpty) call("POST", "feature/bulk", Some(fs))

  override def updateFeature(
      namespace: String,
      name: String,
      description: Option[String],
      meta: Map[String, Option[String]],
      transform: Option[TransformSpec],
      valueType: Option[String]): Unit =
    call("PATCH", "feature",
      Some(Map("namespace" -> namespace, "name" -> name,
        "description" -> description.orNull,
        "meta" -> meta.map { case (k, v) => k -> v.orNull },
        "transform" -> transform.orNull,
        "valueType" -> valueType.orNull)))

  override def deleteFeature(namespace: String, name: String): Unit =
    call("DELETE", "feature", Some(Map("namespace" -> namespace, "name" -> name)))

  /** Client-side like the reference (cloud.py:298-322): read the source
    * entry, strip identity/version, create the copy. The server's create
    * validates destination existence/uniqueness atomically.
    */
  override def cloneFeature(
      srcNs: String, srcName: String, dstNs: String, dstName: String): Feature = {
    val src = getFeature(srcNs, srcName).getOrElse(
      throw new MissingFeatureException(s"feature '$srcNs/$srcName' does not exist"))
    val clone = src.copy(namespace = dstNs, name = dstName, version = 1)
    createFeature(clone)
    clone
  }

  /** Our extension (the reference pins write schemas storage-side,
    * dask.py:66-69; our catalog records them): a dedicated verb so the
    * server can skip the user-edit version bump.
    */
  override private[graft] def pinValueType(
      namespace: String, name: String, dtJson: String): Unit =
    call("POST", "feature/pin",
      Some(Map("namespace" -> namespace, "name" -> name, "valueType" -> dtJson)))
}
