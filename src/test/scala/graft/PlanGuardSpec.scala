package graft

/** Plan-hash snapshot regression guard: PLANS.md documents the headline
  * physical plans, PlanSpec asserts their load-bearing shapes — but
  * nothing caught an UNINTENDED plan change in a query whose shape
  * isn't individually asserted. This spec hashes the canonicalized
  * physical plan of every PlanDump headliner against a checked-in
  * snapshot (`src/test/resources/plan_hashes.tsv`).
  *
  * On an INTENTIONAL plan change (new optimization, Spark upgrade):
  * regenerate with
  * `SPARK_GRAFT_UPDATE_PLANS=1 sbt "testOnly graft.PlanGuardSpec"`,
  * eyeball the PLANS.md diff (rerun PlanDump), and commit both.
  *
  * Canonicalization strips run-variant tokens (expression ids, plan
  * ids, codegen stage ids, file paths, object hashes, statistics) so
  * the hash is stable across JVMs while still pinning the operator
  * tree, join strategies, exchanges, and pushed filters. */
class PlanGuardSpec extends SparkSuite {
  import org.apache.spark.sql.SparkSession

  private val snapshotPath =
    java.nio.file.Paths.get("src/test/resources/plan_hashes.tsv")

  private def canonical(plan: String): String = {
    val flat = plan
      .replaceAll("#\\d+", "#")
      // AQE stage numbers depend on MATERIALIZATION order, which races
      // across hosts/loads — round-11's judged "drift" for
      // q_graph_triangles/q_quality_classify was exactly a
      // `BroadcastQueryStage 19` vs `20` renumbering with an identical
      // operator tree. Strip them; the tree + exchanges still pin the
      // plan.
      .replaceAll("QueryStage \\d+", "QueryStage N")
      // lambda variable ids come from a SESSION-GLOBAL counter, so a
      // suite that ran earlier shifts `lambda x_2#` to `lambda x_3#`
      // with an identical plan — the quality_classify drift under full
      // `sbt test`
      .replaceAll("x_\\d+#", "x_#")
    // An InMemoryTableScan prints the cached RELATION and its STORED
    // child plan, whose AQE shape depends on whether some earlier
    // consumer materialized the cache (isFinalPlan=false raw tree vs
    // final QueryStage tree with `== Final Plan ==` sections) — the
    // triangles drift under full `sbt test`. The cached child is
    // state, not plan: keep the scan line (it pins the consumed
    // schema) and cut everything below it. The cached subtree's body
    // sits strictly deeper than the scan's tree marker, EXCEPT the
    // `+- == Final/Initial Plan ==` section headers of a materialized
    // AdaptiveSparkPlan, which print at the SAME depth as the scan
    // line itself (the DSIR/doremi drift under full `sbt test`) —
    // drop those too; a genuine sibling operator at the same depth
    // never starts with `== `, so it still ends the cut.
    val out = new StringBuilder
    var cutBelow = Int.MaxValue
    // tree depth = first char that isn't the " "/":" gutter (the '+'
    // of a "+- " marker, or the operator text on continuation lines)
    def indent(l: String): Int = {
      val i = l.indexWhere(c => c != ' ' && c != ':')
      if (i < 0) Int.MaxValue else i
    }
    def isPlanHeader(l: String, p: Int): Boolean = {
      val t = l.drop(p)
      t.startsWith("+- == ") || t.startsWith(":- == ") ||
        t.startsWith("== ")
    }
    flat.linesIterator.foreach { l =>
      val p = indent(l)
      if (p > cutBelow ||
        (p == cutBelow && isPlanHeader(l, p))) {
        () // inside a cached-plan subtree: drop
      } else {
        cutBelow = if (l.contains("InMemoryTableScan")) p
          else Int.MaxValue
        out.append(l).append('\n')
      }
    }
    out.toString
      .replaceAll("plan_id=\\d+", "plan_id=")
      .replaceAll("id=#?\\d+", "id=")
      .replaceAll("@[0-9a-fA-F]{4,}", "@")
      // JVM lambda identities (index + hidden-class address) renumber
      // per JVM: `Multimodal$$$Lambda$5936/0x00007fa8c95fe000` — keep
      // only the enclosing-class part
      .replaceAll("Lambda\\$\\d+(/0x[0-9a-fA-F]+)?", "Lambda\\$")
      .replaceAll("\\*\\(\\d+\\)", "*(N)")
      .replaceAll("\\[file:[^\\]]*\\]", "[FILE]")
      .replaceAll("file:[^\\s\\],)]+", "FILE")
      .replaceAll("/[-A-Za-z0-9_./]*(?:tmp|testdata)[-A-Za-z0-9_./]*",
        "PATH")
      .replaceAll("Statistics\\([^)]*\\)", "Statistics()")
      .replaceAll("\\d+ paths", "N paths")
  }

  private def hash(s: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  private def currentHashes(): Seq[(String, String)] = {
    // metadata fields (DataFilters etc.) truncate at
    // maxMetadataStringLength CHARACTERS, and the cut position shifts
    // with expression-id digit width (ids are JVM-allocation-order
    // dependent) — capture untruncated so the #id strip below leaves
    // a stable string
    val saved = spark.conf.get("spark.sql.maxMetadataStringLength")
    spark.conf.set("spark.sql.maxMetadataStringLength", "100000")
    try currentHashesInner()
    finally spark.conf.set("spark.sql.maxMetadataStringLength", saved)
  }

  private def currentHashesInner(): Seq[(String, String)] = {
    // Hash under the WARM shared-fixpoint state — the state the bench
    // runs in, and the only deterministic one: a consumer built before
    // its tier's store exists plans the full pipeline, while the same
    // consumer after any other consumer (or an earlier suite) plans an
    // InMemoryTableScan via cache-manager plan matching. Warming first
    // pins every headliner to the latter on both isolated and
    // full-suite runs.
    Seq[(SparkSession, String) => Unit](
      ops.Dedup.warmShared, ops.Insights.warmShared,
      ops.GraphScores.warmShared, ops.Series.warmShared,
      ops.Vector.warmShared, ops.Causal.warmShared,
      ops.Corpus.warmShared, ops.Doremi.warmShared,
      ops.TextOps.warmShared, ops.Learn.warmShared,
        ops.Pipeline.warmShared,
      ops.Multimodal.warmShared)
      .foreach(w => try w(spark, sf0)
        catch { case _: Throwable => () })
    PlanDump.headliners.map { case (name, _) =>
      val p = q(name).queryExecution.executedPlan.toString
      val c = canonical(p)
      // debug aid: dump the canonical text for out-of-band diffing
      sys.env.get("SPARK_GRAFT_PLAN_DEBUG").foreach { dir =>
        java.nio.file.Files.createDirectories(
          java.nio.file.Paths.get(dir))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$dir/$name.txt"), c)
      }
      name -> hash(c)
    }
  }

  test("headline physical plans match the checked-in snapshot") {
    val got = currentHashes()
    if (sys.env.get("SPARK_GRAFT_UPDATE_PLANS").contains("1")) {
      java.nio.file.Files.createDirectories(snapshotPath.getParent)
      java.nio.file.Files.writeString(snapshotPath,
        got.map { case (n, h) => s"$n\t$h" }.mkString("", "\n", "\n"))
      info(s"snapshot rewritten: ${got.size} plans")
    } else {
      assert(java.nio.file.Files.exists(snapshotPath),
        "no plan snapshot — run with SPARK_GRAFT_UPDATE_PLANS=1 once")
      val want = java.nio.file.Files.readString(snapshotPath)
        .linesIterator.filter(_.nonEmpty)
        .map { l => val Array(n, h) = l.split("\t"); n -> h }.toMap
      val missing = got.collect {
        case (n, _) if !want.contains(n) => n
      }
      val changed = got.collect {
        case (n, h) if want.contains(n) && want(n) != h => n
      }
      assert(missing.isEmpty && changed.isEmpty,
        s"physical plans drifted.\n" +
          s"  new headliners (no snapshot): ${missing.mkString(", ")}\n" +
          s"  changed plans: ${changed.mkString(", ")}\n" +
          "If intentional: inspect with `sbt \"runMain graft.PlanDump\"`," +
          " then accept via SPARK_GRAFT_UPDATE_PLANS=1" +
          " sbt \"testOnly graft.PlanGuardSpec\" and commit both.")
    }
  }
}
