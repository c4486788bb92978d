package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import graft.model.RepoRef

/** Minimal HTTP POST transport so the enumeration client is testable
  * offline and swappable for a mock/recording transport in CI. */
trait HttpTransport extends Serializable {
  /** Returns (statusCode, responseBody). */
  def post(url: String, headers: Map[String, String], body: String): (Int, String)
}

/** Default transport on the JDK client (same stack as [[graft.llm.HttpLlm]]). */
class JdkHttpTransport(timeoutSeconds: Long = 30) extends HttpTransport {
  @transient private lazy val client: HttpClient =
    HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(10)).build()
  override def post(url: String, headers: Map[String, String], body: String): (Int, String) = {
    val builder = HttpRequest.newBuilder()
      .uri(URI.create(url))
      .timeout(Duration.ofSeconds(timeoutSeconds))
    headers.foreach { case (k, v) => builder.header(k, v) }
    val resp = client.send(
      builder.POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }
}

/** S1: repository enumeration over the GitHub GraphQL API (reference
  * `ingest/src/app/services/github_service.py:28-79`): cursor-paginated
  * `repositories(first: 100, isFork: false, privacy: PUBLIC)` walk that
  * carries the name/isArchived/isPrivate flags, skipping archived and
  * private repos. The walk is driver-side BY DESIGN: it is a tiny
  * paginated API listing whose output seeds the per-repo parallelism of
  * the distributed file fetch ([[CorpusStore.readRepoDir]]) — the repo
  * list is never large enough to justify a distributed client, and
  * keeping it on the driver keeps credentials off executors.
  */
class GithubService(
    token: String,
    transport: HttpTransport = new JdkHttpTransport(),
    endpoint: String = "https://api.github.com/graphql",
    pageSize: Int = 100,
    maxPages: Int = 100) {

  import GithubService._

  /** List a user's public, non-fork repositories as [[RepoRef]]s.
    * Archived/private nodes are skipped (the reference logs and drops
    * them, github_service.py:63-69); isFork is false by query predicate.
    * Fails fast on a non-2xx status or a malformed page. */
  def listRepositories(login: String): Seq[RepoRef] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[RepoRef]
    var after: Option[String] = None
    var hasNext = true
    var pages = 0
    while (hasNext && pages < maxPages) {
      val (status, body) = transport.post(
        endpoint,
        Map("Authorization" -> s"Bearer $token",
          "Content-Type" -> "application/json"),
        requestJson(login, after, pageSize))
      if (status / 100 != 2)
        throw new java.io.IOException(
          s"GitHub GraphQL returned $status: ${body.take(500)}")
      val page = parsePage(body).getOrElse(throw new java.io.IOException(
        s"malformed GraphQL page: ${body.take(500)}"))
      out ++= page.repos.collect {
        case r if !r.isArchived && !r.isPrivate =>
          RepoRef(namespace = login, name = r.name,
            defaultBranch = r.defaultBranch.getOrElse("main"),
            isFork = false, isArchived = r.isArchived, isPrivate = r.isPrivate)
      }
      hasNext = page.hasNextPage
      after = page.endCursor
      pages += 1
    }
    out.toSeq
  }
}

object GithubService {

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  /** The reference's query (github_service.py:32-46) plus
    * defaultBranchRef, so the listing carries the branch the file reader
    * needs instead of assuming main. */
  private[sources] def requestJson(
      login: String, after: Option[String], pageSize: Int): String = {
    val query =
      "query($login: String!, $after: String) { user(login: $login) { " +
        s"repositories(first: $pageSize, after: $$after, isFork: false, privacy: PUBLIC) { " +
        "pageInfo { endCursor hasNextPage } " +
        "nodes { name url isArchived isPrivate defaultBranchRef { name } } } } }"
    val afterJson = after.map(a => "\"" + esc(a) + "\"").getOrElse("null")
    s"""{"query":"${esc(query)}","variables":{"login":"${esc(login)}","after":$afterJson}}"""
  }

  private[sources] case class RepoNode(
      name: String,
      isArchived: Boolean,
      isPrivate: Boolean,
      defaultBranch: Option[String])

  private[sources] case class Page(
      repos: Seq[RepoNode],
      hasNextPage: Boolean,
      endCursor: Option[String])

  // dependency-free field pulls, like HttpLlm's response extraction: the
  // response shape is fixed by the query above, so targeted scans beat a
  // JSON parser dependency the build cannot add
  private val NodePat =
    ("""\{\s*"name"\s*:\s*"((?:[^"\\]|\\.)*)"\s*,\s*"url"\s*:\s*"(?:[^"\\]|\\.)*"\s*,""" +
      """\s*"isArchived"\s*:\s*(true|false)\s*,\s*"isPrivate"\s*:\s*(true|false)""" +
      """\s*,\s*"defaultBranchRef"\s*:\s*(null|\{\s*"name"\s*:\s*"((?:[^"\\]|\\.)*)"\s*\})""").r
  private val HasNextPat = """"hasNextPage"\s*:\s*(true|false)""".r
  private val CursorPat = """"endCursor"\s*:\s*(?:"((?:[^"\\]|\\.)*)"|null)""".r

  private def unescape(s: String): String =
    s.replace("\\\"", "\"").replace("\\\\", "\\")

  private[sources] def parsePage(body: String): Option[Page] = {
    val hasNext = HasNextPat.findFirstMatchIn(body).map(_.group(1) == "true")
    if (hasNext.isEmpty) return None
    val cursor = CursorPat.findFirstMatchIn(body).flatMap(m => Option(m.group(1)))
      .map(unescape)
    val repos = NodePat.findAllMatchIn(body).map { m =>
      RepoNode(
        name = unescape(m.group(1)),
        isArchived = m.group(2) == "true",
        isPrivate = m.group(3) == "true",
        defaultBranch = Option(m.group(5)).map(unescape))
    }.toSeq
    Some(Page(repos, hasNext.get, cursor))
  }
}
