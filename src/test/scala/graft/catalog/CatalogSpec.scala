package graft.catalog

import org.scalatest.funsuite.AnyFunSuite

/** Catalog CRUD semantics from the reference (`core.py`, `_model.py`):
  * validation, version bump on update, meta merge with None-delete,
  * delete guards, clone, and crash-safe concurrent persistence.
  */
class CatalogSpec extends AnyFunSuite {

  private def fresh(): (Catalog, String) = {
    val dir = java.nio.file.Files.createTempDirectory("graft-cat").toString
    val loc = s"$dir/catalog.json"
    (new Catalog(loc), loc)
  }

  test("namespace CRUD + versioning + meta merge (test_featurestore.py:145-231)") {
    val (c, _) = fresh()
    c.createNamespace(Namespace("test", "file:///tmp/x", meta = Map("key1" -> "value1")))
    assert(c.getNamespace("test").get.version == 1)
    intercept[IllegalArgumentException](c.createNamespace(Namespace("test", "file:///tmp/y")))
    intercept[IllegalArgumentException](c.createNamespace(Namespace("bad name!", "u")))
    intercept[IllegalArgumentException](c.createNamespace(Namespace("nourl", "")))
    c.updateNamespace("test", meta = Map("key2" -> Some("value2")))
    val ns = c.getNamespace("test").get
    assert(ns.version == 2 && ns.meta == Map("key1" -> "value1", "key2" -> "value2"))
    // None deletes a key (_model.py:58-68)
    c.updateNamespace("test", meta = Map("key1" -> None))
    assert(c.getNamespace("test").get.meta == Map("key2" -> "value2"))
  }

  test("feature CRUD, regex listing, delete guards (test :233-271)") {
    val (c, _) = fresh()
    c.createNamespace(Namespace("ns", "file:///tmp/ns"))
    c.createFeature(Feature("ns", "feature1"))
    c.createFeature(Feature("ns", "feature2"))
    c.createFeature(Feature("ns", "other3"))
    intercept[IllegalArgumentException](c.createFeature(Feature("ns", "feature1")))
    intercept[IllegalArgumentException](c.createFeature(Feature("missing", "f")))
    intercept[IllegalArgumentException](c.createFeature(Feature("ns", "f", partition = "weird")))
    assert(c.listFeatures(Some("ns"), regex = Some("feature.")).map(_.name).sorted ==
      Seq("feature1", "feature2"))
    // namespace with features refuses deletion (core.py:144-149)
    intercept[IllegalArgumentException](c.deleteNamespace("ns"))
    c.deleteFeature("ns", "feature1")
    c.deleteFeature("ns", "feature2")
    c.deleteFeature("ns", "other3")
    c.deleteNamespace("ns")
    assert(c.listNamespaces().isEmpty)
  }

  test("bulk createFeatures: one transaction, all-or-nothing") {
    val (c, _) = fresh()
    c.createNamespace(Namespace("b", "file:///tmp/bulk"))
    c.createFeatures((1 to 200).map(i => Feature("b", f"f$i%03d")))
    assert(c.listFeatures(Some("b")).size == 200)
    // any invalid entry rejects the WHOLE batch — no partial registration
    intercept[IllegalArgumentException](
      c.createFeatures(Seq(Feature("b", "ok-new"), Feature("b", "f001"))))
    assert(c.getFeature("b", "ok-new").isEmpty)
    intercept[IllegalArgumentException](
      c.createFeatures(Seq(Feature("b", "twin"), Feature("b", "twin"))))
    intercept[IllegalArgumentException](
      c.createFeatures(Seq(Feature("missing-ns", "x"))))
    c.createFeatures(Nil) // no-op, no persist
    assert(c.listFeatures(Some("b")).size == 200)
  }

  test("update bumps feature version; clone resets it (core.py:180-208)") {
    val (c, _) = fresh()
    c.createNamespace(Namespace("ns", "file:///tmp/ns2"))
    c.createFeature(Feature("ns", "src", meta = Map("m" -> "1")))
    c.updateFeature("ns", "src", description = Some("d"))
    assert(c.getFeature("ns", "src").get.version == 2)
    val clone = c.cloneFeature("ns", "src", "ns", "dst")
    assert(clone.version == 1 && clone.meta == Map("m" -> "1"))
    intercept[IllegalArgumentException](c.cloneFeature("ns", "src", "ns", "dst"))
  }

  test("parseName splits on first slash; validates charset (_base.py:8-14)") {
    assert(Catalog.parseName("ns/feat") == ("ns", "feat"))
    assert(Catalog.parseName("ns/a/b") == ("ns", "a/b"))
    assert(Catalog.parseName("feat", Some("ns")) == ("ns", "feat"))
    intercept[IllegalArgumentException](Catalog.parseName("feat"))
    assert(Catalog.validName("a.B#_-9"))
    assert(!Catalog.validName("has space"))
  }

  test("two instances on one file see each other's writes (read-modify-write)") {
    val (c1, loc) = fresh()
    val c2 = new Catalog(loc)
    c1.createNamespace(Namespace("from1", "file:///tmp/a"))
    c2.createNamespace(Namespace("from2", "file:///tmp/b"))
    // c2's mutate re-read c1's namespace before writing — nothing lost
    val c3 = new Catalog(loc)
    assert(c3.listNamespaces().map(_.name).toSet == Set("from1", "from2"))
  }

  test("namespace url is unique at create (_model.py:86)") {
    val (c, _) = fresh()
    c.createNamespace(Namespace("a", "file:///tmp/shared-url"))
    // two namespaces on one directory would cross-GC each other's
    // features via cleanNamespace — refused like the reference's
    // unique=True column
    intercept[IllegalArgumentException](
      c.createNamespace(Namespace("b", "file:///tmp/shared-url")))
    // the guard sees through respellings of the same directory — a
    // trailing slash would otherwise re-arm the cross-GC hazard
    intercept[IllegalArgumentException](
      c.createNamespace(Namespace("b", "file:///tmp/shared-url/")))
    c.createNamespace(Namespace("b", "file:///tmp/other-url"))
    assert(c.listNamespaces().size == 2)
  }

  test("updateNamespace replaces storage_options wholesale (core.py:136-142)") {
    val (c, _) = fresh()
    c.createNamespace(Namespace("s", "file:///tmp/s-opts",
      storageOptions = Map("key" -> "old-credential", "region" -> "r1")))
    c.updateNamespace("s", storageOptions = Some(Map("key" -> "rotated")))
    val ns = c.getNamespace("s").get
    // plain assignment, not a merge: rotation must be able to DROP keys
    assert(ns.storageOptions == Map("key" -> "rotated"))
    assert(ns.version == 2)
    // omitting the parameter leaves options untouched
    c.updateNamespace("s", description = Some("d"))
    assert(c.getNamespace("s").get.storageOptions == Map("key" -> "rotated"))
  }

  test("reads see other instances' writes without mutating first (mtime stamp)") {
    val (c1, loc) = fresh()
    val c2 = new Catalog(loc) // constructed before any write exists
    c1.createNamespace(Namespace("n1", "file:///tmp/n1"))
    // pure read path on c2 — no mutate — must observe c1's create
    assert(c2.getNamespace("n1").isDefined)
    c1.createFeature(Feature("n1", "f1"))
    assert(c2.listFeatures(namespace = Some("n1")).map(_.name) == Seq("f1"))
    // and updates, not just creates
    c1.updateNamespace("n1", description = Some("fresh"))
    assert(c2.getNamespace("n1").get.description == "fresh")
  }

  test("state survives reload (persistence round trip)") {
    val (c, loc) = fresh()
    c.createNamespace(Namespace("p", "file:///tmp/p"))
    c.createFeature(Feature("p", "f", serialized = true,
      transform = Some(TransformSpec("sql", "f0 * 2", Seq("p/raw")))))
    val reloaded = new Catalog(loc)
    val f = reloaded.getFeature("p", "f").get
    assert(f.serialized && f.transform.contains(TransformSpec("sql", "f0 * 2", Seq("p/raw"))))
  }

  test("legacy unstamped catalog migrates in place on open (_upgrade.py:12-47)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cat-mig").toString
    val loc = s"$dir/catalog.json"
    // a format-1 document: no formatVersion field, pre-stamp layout
    java.nio.file.Files.writeString(java.nio.file.Paths.get(loc),
      """{
        |  "namespaces": [{"name": "old", "url": "file:///tmp/old-mig",
        |    "description": "", "storageOptions": {}, "backend": "spark",
        |    "meta": {}, "version": 1}],
        |  "features": [{"namespace": "old", "name": "f", "description": "",
        |    "partition": "date", "serialized": false, "transform": null,
        |    "valueType": null, "meta": {}, "version": 1}]
        |}""".stripMargin)
    val c = new Catalog(loc)
    // entries survive the migration...
    assert(c.getNamespace("old").get.url == "file:///tmp/old-mig")
    assert(c.getFeature("old", "f").get.partition == "date")
    // ...and the file itself was rewritten at the current format, so the
    // upgrade runs once, not per load
    val rewritten = java.nio.file.Files.readString(java.nio.file.Paths.get(loc))
    assert(rewritten.contains(s""""formatVersion" : ${Catalog.CurrentFormatVersion}"""))
    // mutations keep the stamp
    c.createFeature(Feature("old", "g"))
    assert(new Catalog(loc).getFeature("old", "g").isDefined)
  }

  test("catalog from a newer library refuses to load") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cat-new").toString
    val loc = s"$dir/catalog.json"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(loc),
      s"""{"namespaces": [], "features": [],
         | "formatVersion": ${Catalog.CurrentFormatVersion + 7}}""".stripMargin)
    val ex = intercept[IllegalStateException](new Catalog(loc))
    assert(ex.getMessage.contains("newer"))
  }
}
