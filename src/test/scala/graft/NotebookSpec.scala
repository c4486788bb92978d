package graft

import graft.operators.Notebook
import org.apache.spark.sql.functions._

/** FIXTURES §2: notebook transform expectations. */
class NotebookSpec extends SparkSpec {
  import spark.implicits._

  private val fixture =
    """{"metadata": {"kernelspec": {"name": "python3", "language": "python"}},
      | "cells": [
      |   {"cell_type": "markdown", "source": "# Title of the notebook"},
      |   {"cell_type": "code", "source": "!pip install pandas", "outputs": []},
      |   {"cell_type": "code", "source": "df.describe()",
      |    "outputs": [{"output_type": "execute_result",
      |                 "data": {"text/plain": "| a | b |"}}]},
      |   {"cell_type": "code", "source": "train()",
      |    "outputs": [{"output_type": "stream",
      |                 "text": "LOGLINES"}]},
      |   {"cell_type": "code", "source": "   "}
      | ]}""".stripMargin
      .replace("LOGLINES",
        (1 to 30).map(i => s"2024-01-01 00:00:0$i INFO step $i").mkString("\\n"))

  private def transform(raw: String): (String, String) = {
    val row = Seq(raw).toDF("text")
      .select(Notebook.transformNotebook(col("text")).as("nb"))
      .select(col("nb.language"), col("nb.text"))
      .head()
    (row.getString(0), row.getString(1))
  }

  test("notebook: markdown kept, setup cell dropped, table output kept, log output dropped, blank cell dropped") {
    val (lang, text) = transform(fixture)
    assert(lang == "python")
    assert(text.contains("# Title of the notebook"))
    assert(!text.contains("pip install"))
    assert(text.contains("df.describe()"))
    assert(text.contains("| a | b |")) // table-marker output kept
    assert(text.contains("train()")) // code kept...
    assert(!text.contains("INFO step")) // ...but log output dropped
    assert(!text.split("\n\n").exists(_.trim.isEmpty))
  }

  test("notebook: ir kernel → r") {
    val nb = """{"metadata":{"kernelspec":{"name":"ir"}},"cells":[{"cell_type":"code","source":"x <- 1"}]}"""
    val (lang, text) = transform(nb)
    assert(lang == "r")
    assert(text.contains("```r\nx <- 1\n```"))
  }

  test("notebook: unparseable JSON → raw text fallback") {
    val (lang, text) = transform("this is not json {")
    assert(lang == "python")
    assert(text == "this is not json {")
  }

  test("F3: ANSI color codes stripped from kept outputs") {
    import org.apache.spark.sql.functions.col
    // the JSON carries a six-char unicode escape; from_json decodes it
    // to a real ESC byte in the cell output
    val nb = "{\"metadata\":{\"kernelspec\":{\"name\":\"python3\"}}," +
      "\"cells\":[{\"cell_type\":\"code\",\"source\":\"print(x)\"," +
      "\"outputs\":[{\"output_type\":\"stream\"," +
      "\"text\":\"\\u001b[31mresult |==| ok\\u001b[0m\"}]}]}"
    val out = Seq(nb).toDF("text")
      .select(graft.operators.Notebook.transformNotebook(col("text")).getField("text"))
      .as[String].head()
    assert(out.contains("result |==| ok"))
    assert(!out.contains(27.toChar.toString), "ESC bytes must be gone")
    assert(!out.contains("[31m"), "color code must be gone")
  }

  test("F3: plain text resembling a bare color code survives stripping") {
    // no ESC byte anywhere: 'dims[3m]' and 'x[0m' are ordinary text and
    // must pass through untouched (the strip anchors on \x1B)
    val nb = "{\"metadata\":{\"kernelspec\":{\"name\":\"python3\"}}," +
      "\"cells\":[{\"cell_type\":\"code\",\"source\":\"print(x)\"," +
      "\"outputs\":[{\"output_type\":\"stream\"," +
      "\"text\":\"dims[3m] x[0m ok\"}]}]}"
    val out = Seq(nb).toDF("text")
      .select(graft.operators.Notebook.transformNotebook(col("text")).getField("text"))
      .as[String].head()
    assert(out.contains("dims[3m] x[0m ok"), out)
  }
}
