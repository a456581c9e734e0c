package graft.git

import java.util.Base64

import com.fasterxml.jackson.databind.ObjectMapper

import graft.net.{HttpCall, HttpTransport}

/** GitHub branch/file/PR automation (reference
  * `src/github_client.py:27-85`, consumed by the `/dbt/pr` route):
  * resolve a branch SHA, create a branch from it (409-equivalent 422
  * "already exists" falls back to the existing SHA), upsert file
  * contents (base64 body, prior-SHA aware), open a pull request. All
  * REST shapes are the public GitHub v3 API; the wire call sits behind
  * [[HttpTransport]] so the flow is testable without network.
  */
object GitHubClient {
  final case class GitHubError(message: String) extends RuntimeException(message)
}

class GitHubClient(
    transport: HttpTransport,
    token: String,
    repo: String, // "owner/repo"
    defaultBranch: String = "main",
    authorName: String = "graft",
    authorEmail: String = "graft@localhost",
    // Injectable for GitHub Enterprise installs and loopback tests;
    // the default is the public API host the reference targets.
    apiBase: String = "https://api.github.com") {
  import GitHubClient.GitHubError

  private val mapper = new ObjectMapper()

  private def headers: Map[String, String] = {
    if (token == null || token.isEmpty) throw GitHubError("GITHUB_TOKEN is not set")
    Map(
      "Authorization" -> s"Bearer $token",
      "Accept" -> "application/vnd.github+json")
  }

  private def api(path: String): String = {
    if (repo == null || repo.isEmpty)
      throw GitHubError("GITHUB_REPO is not set (expected 'owner/repo')")
    s"$apiBase/repos/$repo$path"
  }

  /** Percent-encode one URL path/query value (spaces, '#', '?', …
    * would otherwise truncate or corrupt the request URI). */
  private def enc(segment: String): String =
    java.net.URLEncoder.encode(segment, "UTF-8").replace("+", "%20")

  /** Encode a repo-relative file path, preserving its '/' separators. */
  private def encPath(path: String): String =
    path.split("/", -1).map(enc).mkString("/")

  def getBranchSha(branch: String): String = {
    val r = transport.send(
      HttpCall("GET", api(s"/git/ref/heads/${encPath(branch)}"), headers))
    if (r.status == 404) throw GitHubError(s"Branch not found: $branch")
    if (r.status >= 300) throw GitHubError(s"GET ref failed: ${r.status} ${r.body}")
    mapper.readTree(r.body).path("object").path("sha").asText()
  }

  /** Create `newBranch` from `fromBranch` (default branch when None);
    * an existing branch (422) resolves to its current SHA. */
  def createBranch(newBranch: String, fromBranch: Option[String] = None): String = {
    val base = fromBranch.getOrElse(defaultBranch)
    val sha = getBranchSha(base)
    val o = mapper.createObjectNode()
    o.put("ref", s"refs/heads/$newBranch")
    o.put("sha", sha)
    val r = transport.send(HttpCall("POST", api("/git/refs"), headers,
      Some(mapper.writeValueAsString(o))))
    r.status match {
      case 200 | 201 => mapper.readTree(r.body).path("object").path("sha").asText()
      // 422 covers OTHER validation failures too (invalid ref name,
      // …): blindly resolving those would 404 on getBranchSha and
      // report a nonsensical "Branch not found" for a branch the
      // caller just asked to create — only the already-exists body
      // takes the resolve path
      case 422 if r.body != null &&
          r.body.toLowerCase(java.util.Locale.ROOT)
            .contains("already exists") =>
        getBranchSha(newBranch)
      case s => throw GitHubError(s"Create branch failed: $s ${r.body}")
    }
  }

  def getFileShaIfExists(path: String, branch: String): Option[String] = {
    val r = transport.send(
      HttpCall("GET", api(s"/contents/${encPath(path)}?ref=${enc(branch)}"), headers))
    if (r.status == 404) None
    else if (r.status >= 300)
      throw GitHubError(s"GET contents failed: ${r.status} ${r.body}")
    else Option(mapper.readTree(r.body).path("sha").asText(null))
  }

  /** Create or update `path` on `branch` (reference `upsert_file`):
    * base64 content, configured committer, prior SHA when updating.
    * Returns the response JSON as a tree. */
  def upsertFile(path: String, content: String, branch: String,
      message: String): com.fasterxml.jackson.databind.JsonNode = {
    val b64 = Base64.getEncoder.encodeToString(content.getBytes("UTF-8"))
    val o = mapper.createObjectNode()
    o.put("message", message)
    o.put("content", b64)
    o.put("branch", branch)
    val committer = o.putObject("committer")
    committer.put("name", authorName)
    committer.put("email", authorEmail)
    getFileShaIfExists(path, branch).foreach(o.put("sha", _))
    val r = transport.send(HttpCall("PUT", api(s"/contents/${encPath(path)}"), headers,
      Some(mapper.writeValueAsString(o))))
    if (r.status != 200 && r.status != 201)
      throw GitHubError(s"Upsert file failed: ${r.status} ${r.body}")
    mapper.readTree(r.body)
  }

  def createPullRequest(title: String, head: String,
      base: Option[String] = None,
      body: Option[String] = None): com.fasterxml.jackson.databind.JsonNode = {
    val o = mapper.createObjectNode()
    o.put("title", title)
    o.put("head", head)
    o.put("base", base.getOrElse(defaultBranch))
    body.foreach(o.put("body", _))
    val r = transport.send(HttpCall("POST", api("/pulls"), headers,
      Some(mapper.writeValueAsString(o))))
    if (r.status != 200 && r.status != 201)
      throw GitHubError(s"Create PR failed: ${r.status} ${r.body}")
    mapper.readTree(r.body)
  }
}
