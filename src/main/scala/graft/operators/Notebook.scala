package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Jupyter-notebook handling (SURVEY §2.1 S4, §2.2 F2-F4, §2.3 P2-P3),
  * written as from_json + higher-order-function column programs so the
  * whole transform stays inside Catalyst (no UDF, no collect): parse cells,
  * drop setup cells and blank cells, keep only meaningful outputs, fence
  * code, join with blank lines; fall back to the raw text when the JSON
  * doesn't parse (reference `jupyter_notebook_handling.py`).
  */
object Notebook {

  /** nbformat v4 subset actually consumed (FIXTURES §2). */
  val schema: StructType = StructType(Seq(
    StructField("metadata", StructType(Seq(
      StructField("kernelspec", StructType(Seq(
        StructField("name", StringType),
        StructField("language", StringType))))))),
    StructField("cells", ArrayType(StructType(Seq(
      StructField("cell_type", StringType),
      StructField("source", StringType),
      StructField("outputs", ArrayType(StructType(Seq(
        StructField("output_type", StringType),
        StructField("text", StringType),
        StructField("data", StructType(Seq(
          StructField("text/plain", StringType))))))))))))))

  /** Setup-cell patterns (F2): shell installs, magics, fs commands at the
    * start of any line (reference jupyter_notebook_handling.py:23-60 keeps
    * 21 patterns; semantics = "cell is setup noise"). One multiline regex
    * keeps it a single `rlike`. */
  val setupCellPattern: String =
    "(?m)^\\s*(?:" + Seq(
      "!pip install", "!pip3 install", "%pip install",
      "!conda install", "%conda install",
      "!apt-get", "!apt ", "!brew ",
      "%matplotlib", "%load_ext", "%autoreload", "%env ",
      "!mkdir", "!wget", "!curl", "!unzip", "!tar ",
      "!git clone", "!cd ", "!ls ", "%cd "
    ).map(java.util.regex.Pattern.quote).mkString("|") + ")"

  /** Log-line pattern for output-noise detection (F3). */
  val logLinePattern: String =
    "^\\s*(?:\\d{4}-\\d{2}-\\d{2}[ T]\\d{2}:\\d{2}|" +
      "(?:DEBUG|INFO|WARNING|WARN|ERROR|TRACE)\\b|" +
      "\\d+%\\|)" // tqdm bar

  def parse(raw: Column): Column = from_json(raw, schema)

  /** P2: kernel → language (default python). */
  def kernelLanguage(parsed: Column): Column = {
    val kernel = lower(parsed.getField("metadata").getField("kernelspec").getField("name"))
    coalesce(
      element_at(typedlit(LanguageMap.byKernel), kernel),
      lower(parsed.getField("metadata").getField("kernelspec").getField("language")),
      lit("python"))
  }

  private def stripAnsi(c: Column): Column =
    regexp_replace(c, "\\x1B\\[[;\\d]*m", "")

  /** F3: keep an output iff it looks informative — not a >500-char blob
    * without table markers, and not >30% log lines. */
  def keepOutput(out: Column): Column = {
    val txt = stripAnsi(coalesce(out.getField("text"),
      out.getField("data").getField("text/plain"), lit("")))
    val lines = split(txt, "\n")
    val logRatio =
      when(size(lines) === 0, 0.0)
        .otherwise(size(filter(lines, l => l.rlike(logLinePattern))).cast("double") /
          size(lines).cast("double"))
    val hasTableMarkers = txt.contains("===") || txt.contains("---") || txt.contains("|")
    length(txt) > 0 &&
      !(length(txt) > 500 && !hasTableMarkers) &&
      logRatio <= 0.3
  }

  private def outputText(out: Column): Column =
    stripAnsi(coalesce(out.getField("text"),
      out.getField("data").getField("text/plain"), lit("")))

  /** P3: normalize a parsed notebook to a single text blob; null when the
    * JSON didn't parse (caller coalesces with the raw text). */
  def normalize(parsed: Column, language: Column): Column = {
    val cells = parsed.getField("cells")
    val kept = filter(cells, c =>
      length(trim(coalesce(c.getField("source"), lit("")))) > 0 &&
        !(c.getField("cell_type") === "code" &&
          coalesce(c.getField("source"), lit("")).rlike(setupCellPattern)))
    val rendered = transform(kept, c => {
      val src = trim(c.getField("source"))
      val goodOutputs = filter(coalesce(c.getField("outputs"),
        array().cast(schema("cells").dataType.asInstanceOf[ArrayType]
          .elementType.asInstanceOf[StructType]("outputs").dataType)),
        o => keepOutput(o))
      val outBlock = when(size(goodOutputs) > 0,
        concat(lit("\n\n```output\n"),
          array_join(transform(goodOutputs, o => outputText(o)), "\n"),
          lit("\n```"))).otherwise(lit(""))
      when(c.getField("cell_type") === "markdown", src)
        .otherwise(concat(lit("```"), language, lit("\n"), src, lit("\n```"), outBlock))
    })
    when(parsed.isNull || cells.isNull, lit(null).cast("string"))
      .otherwise(array_join(rendered, "\n\n"))
  }

  /** Full S4+P2+P3 pipeline over a raw-text column: returns
    * struct(language, text) with raw-text fallback on parse failure. */
  def transformNotebook(raw: Column): Column = {
    val parsed = parse(raw)
    val lang = kernelLanguage(parsed)
    val normalized = normalize(parsed, lang)
    struct(
      when(normalized.isNull, lit("python")).otherwise(lang).as("language"),
      coalesce(normalized, raw).as("text"))
  }
}
