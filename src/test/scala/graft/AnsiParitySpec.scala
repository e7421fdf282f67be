package graft

/** ANSI-mode parity sweep — the silent-wraparound audit run as a
  * structural property over the WHOLE registry: every query must
  * return byte-identical rows with `spark.sql.ansi.enabled=true`.
  *
  * Why this matters at 100 TB: under default (non-ANSI) semantics an
  * integer overflow WRAPS and a decimal overflow NULLs — both flow
  * silently into downstream aggregates, which is exactly the failure
  * mode ADVICE r11 #5 flagged for betweenness σ (now assert-guarded).
  * Under ANSI the same conditions THROW. A registry that produces
  * identical output under both modes therefore has no SERVE-PATH
  * arithmetic that silently relies on wrap/NULL-on-overflow at the
  * tested scale — and any FUTURE operator that sneaks one in fails
  * this suite, not a 3 a.m. production job. Division of labor
  * (ADVICE r12 #1, closed in r14): memoized artifacts (graph/BPE
  * memo fills, localCheckpointed lineage) and staged indexes are
  * built once under the suite's default conf and REUSED here, so
  * this sweep certifies the serve/probe paths; the one-time BUILD
  * paths are certified by AnsiBuildSpec, which rebuilds every memo
  * and staged artifact from scratch on a fresh corpus copy with
  * ANSI on.
  *
  * NULL-on-missing lookups that are semantically intended (the
  * Viterbi piece-score probe, the JS-divergence per-source mass) use
  * try_element_at, which keeps NULL semantics in both modes.
  */
class AnsiParitySpec extends SparkTestBase {

  test("every registry query is byte-identical under ANSI mode") {
    val names = SparkEntry.queries.keys.toSeq.sorted
    val diverged = scala.collection.mutable.ArrayBuffer.empty[String]
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val default = fn(spark, SfDir).collect().map(_.toSeq).toSeq
      // restore the PREVIOUS value, not a literal: the session is
      // shared across suites via getOrCreate (ADVICE r12 #2)
      val prev = spark.conf.getOption("spark.sql.ansi.enabled")
      spark.conf.set("spark.sql.ansi.enabled", "true")
      val ansi =
        try Right(fn(spark, SfDir).collect().map(_.toSeq).toSeq)
        catch { case e: Throwable => Left(e.toString.linesIterator.next()) }
        finally prev.fold(spark.conf.unset("spark.sql.ansi.enabled"))(
          spark.conf.set("spark.sql.ansi.enabled", _))
      ansi match {
        case Left(err) => diverged += s"$name THREW under ANSI: $err"
        case Right(rows) if rows != default =>
          diverged += s"$name rows diverged under ANSI"
        case _ => ()
      }
    }
    assert(diverged.isEmpty,
      s"${diverged.size} queries not ANSI-clean:\n  ${diverged.mkString("\n  ")}")
  }
}
