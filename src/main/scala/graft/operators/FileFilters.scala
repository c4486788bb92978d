package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Ingest-side file filtering and language tagging (SURVEY §2.2 F1/F5/F6,
  * §2.3 P1). Pure Column predicates — they compile into the scan filter,
  * so skipped files never leave the source stage.
  *
  * Semantics from the reference (`transform_service.py:10-80`): drop
  * data/binary/media extensions, junk filenames, and specific JSON data
  * files while keeping other JSON; `preprocess_service.py:11-54` ext→
  * language map with dockerfile/compose special cases. The reference keeps
  * three divergent copies of the language map (SURVEY §7.4 risk 5); this
  * is the single source.
  */
object FileFilters {

  val SkipExt: Set[String] = Set(
    "png", "jpg", "jpeg", "gif", "bmp", "ico", "svg", "webp",
    "mp3", "wav", "ogg", "mp4", "avi", "mov", "webm",
    "zip", "tar", "gz", "bz2", "7z", "rar", "jar", "war",
    "so", "dll", "dylib", "bin", "exe", "class", "pyc",
    "csv", "tsv", "parquet", "arrow", "orc", "avro",
    "pdf", "doc", "docx", "xls", "xlsx", "ppt", "pptx",
    "lock", "sum", "woff", "woff2", "ttf", "eot", "otf")

  val SkipNames: Set[String] = Set(
    "license", "license.txt", "license.md", "copying",
    "changelog", "changelog.md", "changelog.txt",
    ".gitignore", ".gitattributes", ".dockerignore", ".editorconfig",
    "notice", "authors", "contributors", "codeowners")

  val SkipJsonNames: Set[String] = Set(
    "package-lock.json", "yarn.lock.json", "composer.lock.json",
    "fixtures.json", "test-data.json", "testdata.json")

  /** Extension (lowercase, no dot) of a path column. */
  def ext(path: Column): Column =
    when(path.contains("."), lower(regexp_extract(path, "\\.([^./\\\\]+)$", 1)))
      .otherwise(lit(""))

  /** Basename (lowercase) of a path column. */
  def baseName(path: Column): Column =
    lower(element_at(split(path, "/"), -1))

  /** F1: keep-predicate over a file path. */
  def keepFile(path: Column): Column = {
    val e = ext(path)
    val n = baseName(path)
    !e.isin(SkipExt.toSeq: _*) &&
      !n.isin(SkipNames.toSeq: _*) &&
      !(e === "json" && n.isin(SkipJsonNames.toSeq: _*))
  }

  /** P1: language tag from extension with special cases. */
  def language(path: Column): Column = {
    val n = baseName(path)
    val e = ext(path)
    when(n === "dockerfile", lit("dockerfile"))
      .when(n.rlike("^docker-compose.*\\.ya?ml$"), lit("docker-compose"))
      .otherwise(coalesce(
        element_at(typedlit(LanguageMap.byExt), e),
        e)) // fallback: the extension itself (reference preprocess_service.py:54)
  }
}

/** Single-source ext→language map (reference keeps three copies:
  * preprocess_service.py:11-20, config.py:51-84, langauge_detector.py:6-37,
  * with a `.cs` → csharp/c_sharp divergence — resolved to `csharp`). */
object LanguageMap {
  val byExt: Map[String, String] = Map(
    "py" -> "python", "ipynb" -> "notebook",
    "js" -> "javascript", "jsx" -> "javascript",
    "ts" -> "typescript", "tsx" -> "typescript",
    "java" -> "java", "scala" -> "scala", "kt" -> "kotlin",
    "c" -> "c", "h" -> "c", "cpp" -> "cpp", "hpp" -> "cpp", "cc" -> "cpp",
    "cs" -> "csharp", "go" -> "go", "rs" -> "rust", "rb" -> "ruby",
    "php" -> "php", "swift" -> "swift", "m" -> "objective-c",
    "sh" -> "bash", "bash" -> "bash", "zsh" -> "bash",
    "sql" -> "sql", "r" -> "r", "jl" -> "julia", "lua" -> "lua",
    "hs" -> "haskell", "ml" -> "ocaml", "mli" -> "ocaml",
    "pl" -> "perl", "html" -> "html", "css" -> "css",
    "yaml" -> "yaml", "yml" -> "yaml", "json" -> "json",
    "toml" -> "toml", "md" -> "markdown", "rst" -> "markdown",
    "txt" -> "text")

  /** Languages the line-window code splitter handles (others fall back to
    * the char splitter — reference langauge_detector.py:93-104). */
  private val codeLangs: Set[String] = byExt.values.toSet --
    Set("markdown", "text", "json", "yaml", "toml", "html", "css", "notebook")

  def known(language: String): Boolean = codeLangs.contains(language)

  /** Kernel-name → language for notebooks (reference
    * langauge_detector.py:39-74). */
  val byKernel: Map[String, String] = Map(
    "python3" -> "python", "python2" -> "python", "python" -> "python",
    "ir" -> "r", "julia" -> "julia", "scala" -> "scala",
    "bash" -> "bash")
}
