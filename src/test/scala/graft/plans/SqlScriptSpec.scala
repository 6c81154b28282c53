package graft.plans

import graft.SparkSpec

/** T1/T3 parity: statement splitter (`transports/mysql.rb:234-249`) and
  * exec/exec! error contract (`base/connection.rb:35-51`). */
class SqlScriptSpec extends SparkSpec {

  test("split: plain semicolon-separated statements") {
    val s = SqlScript.split("SELECT 1;\nSELECT 2;\nSELECT 3")
    assert(s == Seq("SELECT 1", "SELECT 2", "SELECT 3"))
  }

  test("split: multiple statements on one line") {
    assert(SqlScript.split("SELECT 1; SELECT 2;") == Seq("SELECT 1", "SELECT 2"))
  }

  test("split: DELIMITER redefinition (mysql.rb:236-247)") {
    val script =
      """SELECT 1;
        |DELIMITER //
        |CREATE X; WITH SEMI; INSIDE//
        |SELECT 2//
        |DELIMITER ;
        |SELECT 3;""".stripMargin
    val s = SqlScript.split(script)
    assert(s == Seq("SELECT 1", "CREATE X; WITH SEMI; INSIDE", "SELECT 2", "SELECT 3"))
  }

  test("split: trailing statement without delimiter is kept") {
    assert(SqlScript.split("SELECT 1;\nSELECT 2") == Seq("SELECT 1", "SELECT 2"))
  }

  test("split: blank/whitespace-only fragments dropped") {
    assert(SqlScript.split(";;\n ;\nSELECT 1;") == Seq("SELECT 1"))
  }

  test("execBang runs each statement in order and returns the last result") {
    val out = SqlScript.execBang(spark,
      """CREATE OR REPLACE TEMP VIEW sqlscript_t AS SELECT 41 AS v;
        |SELECT v + 1 AS v2 FROM sqlscript_t;""".stripMargin)
    assert(out.get.collect().head.getInt(0) == 42)
  }

  test("execBang raises on bad SQL; exec logs and swallows") {
    val logger = new PlanLogger(false)
    intercept[Exception] { SqlScript.execBang(spark, "SELECT FROM WHERE") }
    val r = SqlScript.exec(spark, "SELECT FROM WHERE", logger)
    assert(r.isEmpty)
    assert(logger.messages.exists(_.contains("transformation failed")))
  }

  test("execFile dispatches a .sql file") {
    val p = java.nio.file.Files.createTempFile("graft_script_", ".sql")
    java.nio.file.Files.writeString(p, "SELECT 7 AS seven;")
    val logger = new PlanLogger(false)
    val out = SqlScript.execFile(spark, p.toString, raiseOnError = true, logger)
    assert(out.get.collect().head.getInt(0) == 7)
  }
}
