package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.store.FileBloom

/** Algebraic properties of the curation kernels over GENERATED inputs
  * (the KernelPropertiesSpec doctrine): the fixture gates certify one
  * configuration; these certify the laws any configuration must hold.
  */
class CurationPropertiesSpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i =>
      g.apply(Gen.Parameters.default.withSize(40), Seed(i.toLong)))

  private def forAll[A](g: Gen[A], n: Int = 12)(f: A => Unit): Unit =
    samples(g, n).foreach(f)

  // ---- FileBloom ------------------------------------------------------

  private val keysGen: Gen[List[String]] =
    Gen.listOf(Gen.oneOf(
      Gen.alphaNumStr,
      Gen.choose(Long.MinValue, Long.MaxValue).map(_.toString),
      Gen.asciiPrintableStr))

  test("bloom: every added key is contained, for any bits/k in range") {
    forAll(for {
      keys <- keysGen
      bits <- Gen.oneOf(64, 512, 8192)
      k <- Gen.choose(1, 12)
    } yield (keys, bits, k)) { case (keys, bits, k) =>
      val words = new Array[Long](bits / 64)
      keys.foreach(FileBloom.add(words, _, k))
      assert(keys.forall(FileBloom.mightContain(words, _, k)))
      // encode/decode round-trips the verdicts exactly
      val Some((k2, w2)) = FileBloom.decode(FileBloom.encode(k, words))
      assert(k2 == k && keys.forall(FileBloom.mightContain(w2, _, k2)))
    }
  }

  test("bloom: union is commutative and contains both sides") {
    forAll(for { a <- keysGen; b <- keysGen } yield (a, b)) { case (a, b) =>
      val wa = new Array[Long](8)
      val wb = new Array[Long](8)
      a.foreach(FileBloom.add(wa, _, 4))
      b.foreach(FileBloom.add(wb, _, 4))
      val u1 = FileBloom.union(wa, wb)
      val u2 = FileBloom.union(wb, wa)
      assert(u1.toSeq == u2.toSeq)
      assert((a ++ b).forall(FileBloom.mightContain(u1, _, 4)))
    }
  }

  // ---- normalizeUrl ---------------------------------------------------

  private val urlGen: Gen[String] = for {
    scheme <- Gen.oneOf("http", "https", "HTTP", "HTTPS", "Https")
    host <- Gen.oneOf("Example.COM", "www.site7.com", "A.B.ORG", "x.io")
    port <- Gen.oneOf("", ":443", ":80", ":8080")
    path <- Gen.oneOf("", "/", "/Path/One", "/a/b/", "/MiXeD")
    query <- Gen.oneOf("", "?id=3", "?utm_source=x", "?utm_source=x&id=3",
      "?id=3&utm_campaign=y&fbclid=zz", "?utm_a=1&utm_b=2")
    frag <- Gen.oneOf("", "#top", "#Sec2")
  } yield s"$scheme://$host$port$path$query$frag"

  test("normalizeUrl: idempotent, fragment/tracking-free, lowercase authority") {
    val toks = samples(urlGen, 60).distinct
    import spark.implicits._
    val df = toks.toDF("u")
      .select(col("u"), TextOps.normalizeUrl(col("u")).as("n1"))
      .select(col("u"), col("n1"), TextOps.normalizeUrl(col("n1")).as("n2"))
    df.collect().foreach { r =>
      val (u, n1, n2) = (r.getString(0), r.getString(1), r.getString(2))
      assert(n1 == n2, s"not idempotent: $u -> $n1 -> $n2")
      assert(!n1.contains("#"), s"fragment survived: $u -> $n1")
      assert(!n1.contains("utm_") && !n1.contains("fbclid"), s"tracking survived: $u -> $n1")
      assert(!n1.endsWith("/") && !n1.endsWith("?") && !n1.endsWith("&"),
        s"trailing junk: $u -> $n1")
      val auth = n1.replaceAll("^([A-Za-z0-9+.-]+://[^/?#]*).*$", "$1")
      assert(auth == auth.toLowerCase, s"authority not lowercased: $u -> $n1")
      // only SCHEME-DEFAULT ports are stripped; http://h:443 survives
      assert(!auth.matches("https://[^/?#:]*:443") && !auth.matches("http://[^/?#:]*:80"),
        s"default port survived: $u -> $n1")
    }
  }

  test("substringDedup: dup-free corpus is identity, canonical keeps its span") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // every token unique per doc AND per corpus -> no digest can dup
    val clean = (0 until 40).map(i =>
      (i.toLong, (0 until 12).map(j => s"u${i * 100 + j}").mkString(" ")))
      .toDF("doc_id", "text")
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
    val out = TextOps.substringDedup(clean, "doc_id", "tk")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.forall(_._3 == 0L), "dup-free corpus must lose nothing")
    assert(out.map(_._2).forall(_.split(" ").length == 12))
    // one boilerplate run pasted into three docs: the LOWEST (doc, pos)
    // keeps it verbatim, both later copies lose exactly the 8 tokens
    val boiler = "b1 b2 b3 b4 b5 b6 b7 b8"
    val docs = Seq(
      (5L, s"x1 x2 $boiler x3 x4"),
      (2L, s"y1 $boiler y2 y3"), // lowest doc_id -> canonical
      (9L, s"$boiler z1 z2"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
    val got = TextOps.substringDedup(docs, "doc_id", "tk")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got(2L) == (s"y1 $boiler y2 y3", 0L), "canonical must keep its span")
    assert(got(5L) == ("x1 x2 x3 x4", 8L))
    assert(got(9L) == ("z1 z2", 8L))
  }
}
