package graft.catalog

import org.scalatest.funsuite.AnyFunSuite

import graft.api.{FeatureStoreException, MissingFeatureException, RemoteFeatureStoreException}

/** S8 remote catalog (cloud.py:22-361): the same CRUD battery CatalogSpec
  * runs locally, driven through CloudCatalog -> HTTP -> CatalogServer ->
  * a real Catalog — so the remote client is semantics-equal to the local
  * one by construction, plus the auth/token behaviors only the remote
  * mode has.
  */
class CloudCatalogSpec extends AnyFunSuite {

  private def withServer(ttlMs: Long = 3600_000L)(
      test: (CloudCatalog, CatalogServer) => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("graft-cloud").toString
    val backing = new Catalog(s"$dir/catalog.json")
    val server = new CatalogServer(backing, Set("refresh-secret"), ttlMs)
    try test(new CloudCatalog(server.url, "refresh-secret"), server)
    finally server.stop()
  }

  test("namespace CRUD + meta None-delete over the wire (cloud.py:183-245)") {
    withServer() { (c, _) =>
      c.createNamespace(Namespace("test", "file:///tmp/cloud-x", meta = Map("key1" -> "value1")))
      assert(c.getNamespace("test").get.version == 1)
      intercept[FeatureStoreException](
        c.createNamespace(Namespace("test", "file:///tmp/cloud-y")))
      intercept[FeatureStoreException](c.createNamespace(Namespace("bad name!", "u")))
      c.updateNamespace("test", meta = Map("key2" -> Some("value2")))
      val ns = c.getNamespace("test").get
      assert(ns.version == 2 && ns.meta == Map("key1" -> "value1", "key2" -> "value2"))
      c.updateNamespace("test", meta = Map("key1" -> None))
      assert(c.getNamespace("test").get.meta == Map("key2" -> "value2"))
      c.deleteNamespace("test")
      assert(c.listNamespaces().isEmpty)
      intercept[MissingFeatureException](c.updateNamespace("test", description = Some("x")))
    }
  }

  test("feature CRUD, regex listing, clone, pin (cloud.py:260-361)") {
    withServer() { (c, _) =>
      c.createNamespace(Namespace("ns", "file:///tmp/cloud-ns"))
      c.createFeature(Feature("ns", "feature1", meta = Map("m" -> "1")))
      c.createFeature(Feature("ns", "feature2"))
      c.createFeature(Feature("ns", "other3",
        transform = Some(TransformSpec("sql", "`ns/feature1` * 2", Seq("ns/feature1")))))
      intercept[FeatureStoreException](c.createFeature(Feature("ns", "feature1")))
      intercept[FeatureStoreException](c.createFeature(Feature("missing", "f")))
      assert(c.listFeatures(Some("ns"), Some("feature.")).map(_.name).sorted ==
        Seq("feature1", "feature2"))
      // transform round-trips through JSON intact
      assert(c.getFeature("ns", "other3").get.transform ==
        Some(TransformSpec("sql", "`ns/feature1` * 2", Seq("ns/feature1"))))
      // update bumps version; pin does not (not a user edit)
      c.updateFeature("ns", "feature1", description = Some("d"),
        meta = Map("m" -> None, "k" -> Some("v")))
      val f1 = c.getFeature("ns", "feature1").get
      assert(f1.version == 2 && f1.meta == Map("k" -> "v") && f1.description == "d")
      c.pinValueType("ns", "feature1", "\"double\"")
      val pinned = c.getFeature("ns", "feature1").get
      assert(pinned.valueType.contains("\"double\"") && pinned.version == 2)
      // clone is client-side get+create (cloud.py:298-322), resets version
      val clone = c.cloneFeature("ns", "feature1", "ns", "copied")
      assert(clone.version == 1 && c.getFeature("ns", "copied").get.meta == Map("k" -> "v"))
      intercept[FeatureStoreException](c.cloneFeature("ns", "feature1", "ns", "copied"))
      intercept[MissingFeatureException](c.cloneFeature("ns", "nope", "ns", "x"))
      // namespace with features refuses deletion
      intercept[FeatureStoreException](c.deleteNamespace("ns"))
    }
  }

  test("bulk createFeatures: one round-trip, server-side all-or-nothing") {
    withServer() { (c, _) =>
      c.createNamespace(Namespace("bk", "file:///tmp/cloud-bulk"))
      c.createFeatures((1 to 50).map(i => Feature("bk", f"f$i%02d")))
      assert(c.listFeatures(Some("bk")).size == 50)
      intercept[FeatureStoreException](
        c.createFeatures(Seq(Feature("bk", "fresh"), Feature("bk", "f01"))))
      assert(c.getFeature("bk", "fresh").isEmpty)
    }
  }

  test("expired access tokens auto-refresh (cloud.py:107-123)") {
    // TTL shorter than the client's 10s refresh margin: every call must
    // fetch a fresh token, and all must still succeed
    withServer(ttlMs = 1000L) { (c, _) =>
      c.createNamespace(Namespace("t", "file:///tmp/cloud-t"))
      (1 to 3).foreach(i => c.updateNamespace("t", meta = Map(s"k$i" -> Some(s"$i"))))
      assert(c.getNamespace("t").get.meta.keySet == Set("k1", "k2", "k3"))
    }
  }

  test("bad refresh token fails loudly; bad access token is 401") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cloud").toString
    val server = new CatalogServer(new Catalog(s"$dir/catalog.json"), Set("right"))
    try {
      intercept[FeatureStoreException](new CloudCatalog(server.url, "wrong"))
      // hand-rolled request with a bogus bearer: server must refuse
      val http = java.net.http.HttpClient.newHttpClient()
      val resp = http.send(
        java.net.http.HttpRequest.newBuilder(java.net.URI.create(server.url + "/v1/namespace"))
          .header("Authorization", "forged").GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(resp.statusCode() == 401)
    } finally server.stop()
  }

  test("unreachable endpoint raises RemoteFeatureStoreException") {
    intercept[RemoteFeatureStoreException](
      new CloudCatalog("http://127.0.0.1:1", "x",
        requestTimeout = java.time.Duration.ofMillis(500)))
  }

  test("two clients, one server: writes are visible across clients") {
    withServer() { (c1, server) =>
      val c2 = new CloudCatalog(server.url, "refresh-secret")
      c1.createNamespace(Namespace("shared", "file:///tmp/cloud-shared"))
      c2.createFeature(Feature("shared", "f"))
      assert(c1.listFeatures(Some("shared")).map(_.name) == Seq("f"))
    }
  }
}
