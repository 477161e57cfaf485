package graft

import org.apache.spark.sql.functions._

/** scan.parse.error-policy (the reference's Debezium errors.tolerance):
  * fail (default) stops on an undecodable log line with the line in the
  * error; skip drops exactly the garbage and the merged state matches the
  * clean database. */
class CdcParseErrorSpec extends SparkSpecBase {
  import spark.implicits._

  private def writeDb(dir: String, corrupt: Boolean): Unit = {
    import java.nio.file.{Files, Paths, StandardOpenOption}
    val snap = (1L to 50L).map(i => (i, s"v$i")).toDF("id", "v")
    val env = graft.cdc.ChangelogGen.changes(snap,
      graft.cdc.ChangelogGen.Spec(pk = "id", measure = "id", table = "t"))
    // measure == pk is fine for this test: updates double nothing visible,
    // but inserts/deletes still mutate the key set
    graft.cdc.FileCdcDatabase.write(spark, dir, "t", "graft", "id",
      snapshot = snap, changes = env, force = true)
    if (corrupt) {
      val logFile = Paths.get(
        graft.cdc.FileCdcDatabase.dataFiles(dir, "t", "log").head)
      val lines = Files.readAllLines(logFile)
      lines.add(lines.size / 2, """{"truncated": [1,""")
      lines.add(0, """{"wellformed":"but not an envelope"}""")
      Files.write(logFile, lines, StandardOpenOption.TRUNCATE_EXISTING)
    }
  }

  private def read(dir: String, policy: Option[String]) = {
    val r = spark.read.format("graft-cdc")
      .option("path", dir).option("table", "t")
      .option("scan.startup.mode", "initial")
      .option("scan.incremental.snapshot.chunk.size", "10")
    policy.fold(r)(p => r.option("scan.parse.error-policy", p))
      .load().select(col("id"), col("v"))
  }

  test("default policy fails loudly on a garbage log line") {
    val dir = tmpDir("parse-fail")
    writeDb(dir, corrupt = true)
    val e = intercept[org.apache.spark.SparkException] {
      read(dir, None).collect()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else t.getMessage +: chain(t.getCause)
    assert(chain(e).exists(m => m != null &&
      m.contains("scan.parse.error-policy=fail")), chain(e).mkString(" | "))
  }

  test("skip policy drops exactly the garbage; state matches clean db") {
    val clean = tmpDir("parse-clean"); val dirty = tmpDir("parse-dirty")
    writeDb(clean, corrupt = false)
    writeDb(dirty, corrupt = true)
    val want = read(clean, None).collect().map(_.toString).sorted
    val got = read(dirty, Some("skip")).collect().map(_.toString).sorted
    assert(got.sameElements(want),
      s"want ${want.length} rows, got ${got.length}")
  }

  test("non-integral __offset surfaces under fail policy (not coerced to 0)") {
    // regression: the Jackson fallback used .asLong(), which coerces a
    // string/null/object __offset to 0 — the 'off > from' range filter then
    // silently dropped the line even under fail. A non-integral offset must
    // flow through to the decode step where the policy decides.
    import java.nio.file.{Files, Paths, StandardOpenOption}
    val dir = tmpDir("parse-offstr")
    writeDb(dir, corrupt = false)
    val logFile = Paths.get(
      graft.cdc.FileCdcDatabase.dataFiles(dir, "t", "log").head)
    val lines = Files.readAllLines(logFile)
    val i = lines.size / 2
    lines.set(i, lines.get(i).replaceFirst(
      "\"__offset\"\\s*:\\s*\\d+", "\"__offset\":\"not-a-number\""))
    assert(lines.get(i).contains("\"not-a-number\""), lines.get(i))
    Files.write(logFile, lines, StandardOpenOption.TRUNCATE_EXISTING)
    val e = intercept[org.apache.spark.SparkException] {
      read(dir, None).collect()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else t.getMessage +: chain(t.getCause)
    assert(chain(e).exists(m => m != null &&
      m.contains("scan.parse.error-policy=fail")), chain(e).mkString(" | "))
    // and skip still converges to the clean state minus that one event
    val got = read(dir, Some("skip")).collect()
    assert(got.nonEmpty)
  }

  test("policy is validated at scan start") {
    val dir = tmpDir("parse-bad")
    writeDb(dir, corrupt = false)
    val e = intercept[Exception] {
      read(dir, Some("ignore")).collect()
    }
    assert(e.getMessage.contains("fail|skip"), e.getMessage)
  }
}
