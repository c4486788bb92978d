package graft

import graft.sources.{GithubService, HttpTransport}
import org.scalatest.funsuite.AnyFunSuite

/** S1 enumeration client against a recorded fake transport: pagination,
  * archived/private skip, branch carry-through, error propagation
  * (reference github_service.py:28-79). */
class GithubServiceSpec extends AnyFunSuite {

  private def node(
      name: String,
      archived: Boolean = false,
      priv: Boolean = false,
      branch: Option[String] = Some("main")): String = {
    val b = branch.map(br => s"""{ "name": "$br" }""").getOrElse("null")
    s"""{ "name": "$name", "url": "https://example.invalid/$name",
       |  "isArchived": $archived, "isPrivate": $priv,
       |  "defaultBranchRef": $b }""".stripMargin
  }

  private def page(nodes: Seq[String], cursor: Option[String]): String =
    s"""{ "data": { "user": { "repositories": {
       |  "pageInfo": { "endCursor": ${cursor.map("\"" + _ + "\"").getOrElse("null")},
       |                "hasNextPage": ${cursor.isDefined} },
       |  "nodes": [ ${nodes.mkString(",\n")} ] } } } }""".stripMargin

  /** Scripted transport: returns canned pages in order; records requests. */
  private class FakeTransport(pages: Seq[(Int, String)]) extends HttpTransport {
    val requests = scala.collection.mutable.ArrayBuffer.empty[String]
    private var i = 0
    override def post(url: String, headers: Map[String, String], body: String): (Int, String) = {
      assert(headers("Authorization") == "Bearer tok", "token must be sent")
      requests += body
      val r = pages(math.min(i, pages.length - 1)); i += 1; r
    }
  }

  test("paginates with the cursor; skips archived and private repos") {
    val t = new FakeTransport(Seq(
      200 -> page(Seq(node("alpha"), node("old", archived = true),
        node("secret", priv = true)), cursor = Some("CUR1")),
      200 -> page(Seq(node("beta", branch = Some("develop")),
        node("gamma", branch = None)), cursor = None)))
    val repos = new GithubService("tok", t).listRepositories("octo")
    assert(repos.map(_.name) == Seq("alpha", "beta", "gamma"))
    assert(repos.forall(r => !r.isArchived && !r.isPrivate && !r.isFork))
    assert(repos.map(_.defaultBranch) == Seq("main", "develop", "main"),
      "defaultBranchRef carries through; null falls back to main")
    assert(repos.forall(_.namespace == "octo"))
    assert(t.requests.length == 2)
    assert(t.requests.head.contains("\"after\":null"))
    assert(t.requests(1).contains("\"after\":\"CUR1\""),
      "second page must resume from the first page's endCursor")
    assert(t.requests.head.contains("isFork: false") &&
      t.requests.head.contains("privacy: PUBLIC"),
      "fork/private exclusion is a query predicate, like the reference")
  }

  test("non-2xx fails fast") {
    val t = new FakeTransport(Seq(401 -> """{"message":"Bad credentials"}"""))
    val e = intercept[java.io.IOException] {
      new GithubService("tok", t).listRepositories("octo")
    }
    assert(e.getMessage.contains("401"))
  }

  test("malformed page fails fast rather than returning a partial list") {
    val t = new FakeTransport(Seq(200 -> """{"data": {"user": null}}"""))
    val e = intercept[java.io.IOException] {
      new GithubService("tok", t).listRepositories("octo")
    }
    assert(e.getMessage.contains("malformed"))
  }

  test("maxPages caps a runaway cursor walk") {
    val t = new FakeTransport(Seq(
      200 -> page(Seq(node("loop")), cursor = Some("SAME"))))
    val repos = new GithubService("tok", t, maxPages = 3).listRepositories("octo")
    assert(repos.length == 3, "one repo per page, capped at maxPages")
  }

  test("listing feeds the ingest eligibility filter end to end") {
    val t = new FakeTransport(Seq(
      200 -> page(Seq(node("keep"), node("old", archived = true)), cursor = None)))
    val listed = new GithubService("tok", t).listRepositories("octo")
    // the client already drops archived/private; eligibleRepos is the F5
    // filter the pipeline applies regardless of which enumerator ran
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled", "false").getOrCreate()
    try {
      val eligible = graft.sources.CorpusStore.eligibleRepos(spark, listed)
        .collect().map(_.name).toSeq
      assert(eligible == Seq("keep"))
    } finally ()
  }

  test("escaped names and cursors round-trip") {
    val t = new FakeTransport(Seq(
      200 -> page(Seq(node("""we\\ird\"repo""")), cursor = None)))
    val repos = new GithubService("tok", t).listRepositories("octo")
    assert(repos.map(_.name) == Seq("""we\ird"repo"""))
  }
}
