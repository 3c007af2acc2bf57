package graft.api

import graft.SparkSpec
import graft.catalog.{Catalog, CatalogServer, CloudCatalog}

/** The reference's hosted mode end-to-end (cloud.py:441-551): metadata
  * through a REST catalog, DATA staying local to the caller's Spark —
  * the identical FeatureStore compute path behind a CloudCatalog.
  */
class CloudFeatureStoreSpec extends SparkSpec {
  import spark.implicits._

  test("FeatureStore.connect dispatches on the connection string (__init__.py:33-50)") {
    val dir = tmpDir("graft-connect")
    val local = FeatureStore.connect(spark, s"$dir/catalog.json")
    local.createNamespace("l", s"$dir/wh")
    assert(local.listNamespaces().map(_.name) == Seq("l"))
    val server = new CatalogServer(new Catalog(s"$dir/remote.json"), Set("tok"))
    try {
      intercept[FeatureStoreException](FeatureStore.connect(spark, server.url))
      val remote = FeatureStore.connect(spark, server.url, token = Some("tok"))
      remote.createNamespace("r", s"$dir/whr")
      assert(remote.listNamespaces().map(_.name) == Seq("r"))
    } finally server.stop()
  }

  test("save/load/last through a remote catalog (cloud.py:481-551)") {
    val dir = tmpDir("graft-cloudfs")
    val server = new CatalogServer(
      new Catalog(s"$dir/catalog.json"), Set("secret"))
    try {
      val fs = new FeatureStore(spark, new CloudCatalog(server.url, "secret"))
      fs.createNamespace("cloudns", s"$dir/warehouse")
      fs.createFeature("cloudns/f1")
      val df = (0 until 5).map { i =>
        (new java.sql.Timestamp(ts("2021-01-01").getTime + i * 86400000L), i * 1.5)
      }.toDF("time", "value")
      fs.saveDataFrame(df, Some("cloudns/f1"))
      val out = fs.loadDataFrame(Seq("cloudns/f1"),
        fromDate = Some(ts("2021-01-01")), toDate = Some(ts("2021-01-05")))
      assert(out.count() == 5)
      assert(fs.last(Seq("cloudns/f1"))("cloudns/f1").contains(6.0))
      // schema pin travelled through the REST pin verb
      assert(fs.catalog.getFeature("cloudns", "f1").get.valueType.contains("\"double\""))
      // a second, independent store on the same server sees the data
      val fs2 = new FeatureStore(spark, new CloudCatalog(server.url, "secret"))
      assert(fs2.loadDataFrame(Seq("cloudns/f1"),
        fromDate = Some(ts("2021-01-01")), toDate = Some(ts("2021-01-05"))).count() == 5)
    } finally server.stop()
  }
}
