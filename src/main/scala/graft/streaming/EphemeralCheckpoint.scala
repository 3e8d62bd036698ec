package graft.streaming

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, FileNotFoundException, InputStream, OutputStream}
import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileAlreadyExistsException, FileStatus, FSDataInputStream, Path, PathFilter, PositionedReadable, Seekable}
import org.apache.spark.sql.execution.streaming.checkpointing.CheckpointFileManager
import org.apache.spark.sql.execution.streaming.checkpointing.CheckpointFileManager.CancellableFSDataOutputStream

/** RAM-backed [[CheckpointFileManager]] for FINITE drains.
  *
  * A `Trigger.AvailableNow` drain with a temporary checkpoint gets NO
  * recovery value from its checkpoint: Spark deletes the directory the
  * moment the query succeeds, so the offset/commit logs and state-store
  * delta files it fsyncs exist only to be erased. This manager keeps
  * those "files" in a JVM-wide map with the same atomic-rename
  * semantics (concurrent `createAtomic(overwrite=false)` of one batch
  * file → `FileAlreadyExistsException` on close, exactly what
  * HDFSMetadataLog's leader election relies on), eliminating the
  * per-drain fixed cost of ~40 checkpoint-file round-trips through
  * Hadoop's LocalFileSystem (CRC shadow files, stream open/fsync/close
  * — measured ~115 ms of walCommit+commitOffsets+latestOffset plus the
  * state-store share of addBatch per drain at sf0.1).
  *
  * Scope: enabled per-query by [[StreamOps]]' drain helper ONLY for
  * finite, temp-checkpoint drains — the map is JVM-local, so on a real
  * multi-executor cluster (where state-store providers reload deltas
  * after executor loss) the default durable manager stays in force for
  * any query that needs recovery. Within one JVM the versioned-file
  * semantics are identical, which is why multi-batch replays (state
  * reload across a stop/restart in the same session) still work.
  *
  * Instantiated reflectively by `CheckpointFileManager.create` via
  * `spark.sql.streaming.checkpointFileManagerClass`; the (Path,
  * Configuration) constructor shape is that contract. */
class EphemeralCheckpoint(root: Path, conf: Configuration)
    extends CheckpointFileManager {
  import EphemeralCheckpoint._

  override def createAtomic(path: Path,
      overwriteIfPossible: Boolean): CancellableFSDataOutputStream = {
    val key = norm(path)
    val buf = new ByteArrayOutputStream(4096)
    new CancellableFSDataOutputStream(buf) {
      private var done = false
      override def cancel(): Unit = { done = true }
      override def close(): Unit = synchronized {
        if (!done) {
          done = true
          super.close()
          val bytes = buf.toByteArray
          files.synchronized {
            if (!overwriteIfPossible && files.containsKey(key))
              throw new FileAlreadyExistsException(key)
            files.put(key, Entry(bytes, System.currentTimeMillis()))
          }
          committed.incrementAndGet()
          markParents(key)
        }
      }
    }
  }

  override def open(path: Path): FSDataInputStream = {
    val e = files.get(norm(path))
    if (e == null) throw new FileNotFoundException(norm(path))
    new FSDataInputStream(new SeekableBytes(e.bytes))
  }

  override def list(path: Path, filter: PathFilter): Array[FileStatus] = {
    val dir = norm(path)
    val prefix = if (dir.endsWith("/")) dir else dir + "/"
    val out = scala.collection.mutable.ArrayBuffer[FileStatus]()
    val seenDirs = scala.collection.mutable.HashSet[String]()
    files.forEach { (k, e) =>
      if (k.startsWith(prefix)) {
        val rest = k.substring(prefix.length)
        val slash = rest.indexOf('/')
        if (slash < 0) {
          val p = new Path("file://" + k)
          if (filter == null || filter.accept(p))
            out += new FileStatus(e.bytes.length.toLong, false, 1, 4096L,
              e.mtime, p)
        } else seenDirs += prefix + rest.substring(0, slash)
      }
    }
    dirs.forEach { (k, _) =>
      if (k.startsWith(prefix) && !k.substring(prefix.length).contains('/'))
        seenDirs += k
    }
    seenDirs.foreach { d =>
      val p = new Path("file://" + d)
      if (filter == null || filter.accept(p))
        out += new FileStatus(0L, true, 1, 4096L, 0L, p)
    }
    out.toArray
  }

  override def mkdirs(path: Path): Unit = {
    dirs.put(norm(path), java.lang.Boolean.TRUE)
    markParents(norm(path))
  }

  override def exists(path: Path): Boolean = {
    val key = norm(path)
    files.containsKey(key) || dirs.containsKey(key)
  }

  override def delete(path: Path): Unit = {
    val key = norm(path)
    files.remove(key)
    dirs.remove(key)
    val prefix = key + "/"
    files.keySet.removeIf(_.startsWith(prefix))
    dirs.keySet.removeIf(_.startsWith(prefix))
  }

  override def isLocal: Boolean = true

  override def createCheckpointDirectory(): Path = {
    mkdirs(root)
    root
  }

  private def markParents(key: String): Unit = {
    var p = key.lastIndexOf('/')
    while (p > 0) {
      val d = key.substring(0, p)
      if (dirs.putIfAbsent(d, java.lang.Boolean.TRUE) != null) return
      p = d.lastIndexOf('/')
    }
  }
}

object EphemeralCheckpoint {
  private case class Entry(bytes: Array[Byte], mtime: Long)

  // JVM-wide: the state-store threads and the driver's metadata logs
  // each instantiate their own manager for the same checkpoint root
  private val files = new ConcurrentHashMap[String, Entry]()
  private val dirs = new ConcurrentHashMap[String, java.lang.Boolean]()

  /** Scheme-free canonical key (paths arrive both as `/x/y` and
    * `file:/x/y` depending on the caller). */
  private def norm(p: Path): String = p.toUri.getPath

  /** Test/metrics hook: number of live in-memory checkpoint files. */
  private[graft] def liveFiles: Int = files.size

  /** Test/metrics hook: total files ever committed through this
    * manager — EphemeralCheckpointSpec asserts it MOVES across a
    * drain, so losing the drain-helper conf wiring (a silent ~0.3 s
    * per-drain perf regression) fails CI instead of a bench diff. */
  private val committed = new java.util.concurrent.atomic.AtomicLong()
  private[graft] def committedCount: Long = committed.get

  /** Hadoop-readable view over a byte array (FSDataInputStream needs
    * Seekable + PositionedReadable). */
  private final class SeekableBytes(bytes: Array[Byte]) extends InputStream
      with Seekable with PositionedReadable {
    private var pos = 0
    override def read(): Int =
      if (pos >= bytes.length) -1
      else { val b = bytes(pos) & 0xff; pos += 1; b }
    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      if (pos >= bytes.length) return -1
      val n = math.min(len, bytes.length - pos)
      System.arraycopy(bytes, pos, b, off, n)
      pos += n
      n
    }
    override def available(): Int = bytes.length - pos
    override def seek(newPos: Long): Unit = pos = newPos.toInt
    override def getPos: Long = pos.toLong
    override def seekToNewSource(targetPos: Long): Boolean = false
    override def read(position: Long, buffer: Array[Byte], offset: Int,
        length: Int): Int = {
      if (position >= bytes.length) return -1
      val n = math.min(length, bytes.length - position.toInt)
      System.arraycopy(bytes, position.toInt, buffer, offset, n)
      n
    }
    override def readFully(position: Long, buffer: Array[Byte],
        offset: Int, length: Int): Unit = {
      if (read(position, buffer, offset, length) < length)
        throw new java.io.EOFException()
    }
    override def readFully(position: Long, buffer: Array[Byte]): Unit =
      readFully(position, buffer, 0, buffer.length)
  }
}
