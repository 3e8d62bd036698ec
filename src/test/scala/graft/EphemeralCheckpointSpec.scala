package graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileAlreadyExistsException, Path}

/** Contracts of the RAM-backed checkpoint manager that streaming
  * correctness silently leans on:
  *  - atomic non-overwrite create throws FileAlreadyExistsException on
  *    close (HDFSMetadataLog's batch leader election),
  *  - read-back and listing see exactly what was committed (offset/
  *    delta replay), cancel commits nothing,
  *  - recursive delete (Spark's on-success temp-checkpoint cleanup)
  *    leaves no entries behind — the leak bound for a 500-drain bench
  *    session.
  * End-to-end result equivalence is covered by the 54 q_stream_* oracle
  * rows; StreamSpec covers multi-batch replays. */
class EphemeralCheckpointSpec extends SparkSuite {

  private def mgr(root: String) =
    new streaming.EphemeralCheckpoint(new Path(root), new Configuration())

  test("atomic create honors the non-overwrite leader-election contract") {
    val m = mgr("/eph_test/a")
    val p = new Path("/eph_test/a/offsets/0")
    val out = m.createAtomic(p, overwriteIfPossible = false)
    out.write("batch0".getBytes("UTF-8")); out.close()
    assert(m.exists(p))
    val loser = m.createAtomic(p, overwriteIfPossible = false)
    loser.write("batch0-dup".getBytes("UTF-8"))
    intercept[FileAlreadyExistsException] { loser.close() }
    // overwrite=true path replaces
    val ow = m.createAtomic(p, overwriteIfPossible = true)
    ow.write("batch0-v2".getBytes("UTF-8")); ow.close()
    val in = m.open(p)
    val buf = new Array[Byte](32)
    val n = in.read(buf)
    assert(new String(buf, 0, n, "UTF-8") == "batch0-v2")
    m.delete(new Path("/eph_test/a"))
  }

  test("cancel commits nothing; list sees files and implied dirs") {
    val m = mgr("/eph_test/b")
    val p = new Path("/eph_test/b/state/0/0/1.delta")
    val c = m.createAtomic(p, overwriteIfPossible = true)
    c.write("x".getBytes); c.cancel()
    assert(!m.exists(p))
    val ok = m.createAtomic(p, overwriteIfPossible = true)
    ok.write("y".getBytes); ok.close()
    val ls = m.list(new Path("/eph_test/b/state/0/0"))
    assert(ls.map(_.getPath.getName).toSet == Set("1.delta"))
    val dirs = m.list(new Path("/eph_test/b/state"))
    assert(dirs.exists(s => s.isDirectory && s.getPath.getName == "0"))
    m.delete(new Path("/eph_test/b"))
  }

  test("a finished drain leaves no in-memory checkpoint files behind") {
    val before = streaming.EphemeralCheckpoint.liveFiles
    val committedBefore = streaming.EphemeralCheckpoint.committedCount
    // two drains through the registered path (memory-sink settle)
    q("q_stream_source").count()
    q("q_stream_tumbling").count()
    val after = streaming.EphemeralCheckpoint.liveFiles
    // the drain helper must actually ROUTE through this manager —
    // losing the conf wiring is a silent ~0.3 s/drain perf regression
    assert(streaming.EphemeralCheckpoint.committedCount > committedBefore,
      "drains did not write through EphemeralCheckpoint — is the " +
        "drain helper's checkpointFileManagerClass wiring gone?")
    // Spark deletes the temp checkpoint through the SAME manager on
    // success, so the map must not grow drain-over-drain
    assert(after <= before,
      s"ephemeral checkpoint files leaked: $before -> $after")
  }
}
