package graft.store

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** One log record on the "wire": flat string key/values plus fixed
  * metadata — the data model of the reference's SLS store
  * (LoghubSourceRDD.scala:145-231: LogGroup{topic,source,tags} /
  * Log{time,contents}). */
case class LogRecord(
    time: Int, // unix seconds
    topic: String,
    source: String,
    tags: Map[String, String],
    contents: Map[String, String])

case class ShardInfo(id: Int, readOnly: Boolean)

/** A staged-but-uncommitted segment data file; carried in writer commit
  * messages from tasks to the driver's manifest commit. */
case class StagedSegment(shard: Int, file: String)

/** File-backed sharded log store — the hermetic stand-in for the log
  * service the reference connects to (replaces LoghubClientAgent.java;
  * cursor model per Utils.decodeCursorToTimestamp, Utils.scala:221-225).
  *
  * Layout: `<root>/<project>/<store>/meta.json`, a `manifests/` commit
  * log, and per shard a directory of immutable JSONL segment files. A
  * shard's logical record sequence is the concatenation of its segments
  * in **manifest commit order**; a **cursor** is a base64-encoded record
  * ordinal in that sequence (the reference's cursors also decode to
  * numbers). Segment names carry their time bounds and record count
  * (`<name>-<minT>-<maxT>-<count>.jsonl`) so ordinal→segment seeks and
  * time-range pruning need no data reads.
  *
  * **Commit protocol** (two-phase, Delta-style): writers [[stageSegment]]
  * data files into the shard dirs — invisible to readers until a
  * manifest references them — then one [[commitSegments]] call publishes
  * the whole write atomically by linking `manifests/m-<version>.json`
  * (hard-link creation is atomic-fail-if-exists, so two racing
  * committers can never claim the same version; the loser re-reads and
  * retries with the next one). Readers fold the manifests in version
  * order, which makes segment ordinals append-only and stable even
  * while concurrent jobs are writing — a directory listing can tell you
  * a file exists, only the commit log can tell you *when it became
  * data*. Replayed epochs re-stage the same logical segment name and
  * commit idempotently: the file is replaced in place and its ordinal
  * position stays pinned by the first manifest that listed it.
  *
  * On a cluster the root lives on shared storage; every operation here
  * is a pure function of manifest contents, so any executor can read or
  * write without coordination beyond the version link.
  */
class EmbeddedLogStore(root: String, ioRetries: Int = 10,
    ioBackoffMs: Long = 1000, ioMaxBackoffMs: Long = 10000)
    extends Serializable {
  import EmbeddedLogStore._

  /** Fault-injection seam for tests: every retryable IO section runs
    * through here. Production is the identity. */
  protected def fsOp[T](op: => T): T = op

  /** Retryable storage-IO section: transient IOExceptions back off and
    * retry per the reference client contract ([[Retry.io]]); protocol
    * signals (NoSuchFile / FileAlreadyExists) pass through to their
    * handlers. */
  private def io[T](op: => T): T =
    Retry.io(ioRetries, ioBackoffMs, ioMaxBackoffMs)(fsOp(op))

  private def storeDir(project: String, store: String) =
    Paths.get(root, project, store)
  private def shardDir(project: String, store: String, shard: Int) =
    storeDir(project, store).resolve(s"shard-$shard")
  private def metaPath(project: String, store: String) =
    storeDir(project, store).resolve("meta.json")
  private def manifestDir(project: String, store: String) =
    storeDir(project, store).resolve("manifests")

  def createStore(project: String, store: String, numShards: Int): Unit = {
    require(numShards > 0)
    val dir = storeDir(project, store)
    Files.createDirectories(dir)
    val shards = (0 until numShards).map(ShardInfo(_, readOnly = false))
    writeMeta(project, store, shards)
    shards.foreach(s => Files.createDirectories(shardDir(project, store, s.id)))
  }

  def listShards(project: String, store: String): Seq[ShardInfo] = {
    val mapper = new ObjectMapper()
    val tree = mapper.readTree(io(Files.readAllBytes(metaPath(project, store))))
    tree.get("shards").elements().asScala.map { n =>
      ShardInfo(n.get("id").asInt(), n.get("readOnly").asBoolean())
    }.toSeq.sortBy(_.id)
  }

  private def writeMeta(project: String, store: String, shards: Seq[ShardInfo]): Unit = {
    val mapper = new ObjectMapper()
    val rootNode = mapper.createObjectNode()
    val arr = rootNode.putArray("shards")
    shards.sortBy(_.id).foreach { s =>
      val n = arr.addObject()
      n.put("id", s.id); n.put("readOnly", s.readOnly)
    }
    io(Files.write(metaPath(project, store),
      mapper.writeValueAsBytes(rootNode)))
  }

  /** Split a shard: parent becomes read-only, two new shards are created
    * (reference semantics: parent drains then is skipped —
    * DirectLoghubInputDStream.scala:138-145). */
  def splitShard(project: String, store: String, shard: Int): (Int, Int) = {
    val shards = listShards(project, store)
    require(shards.exists(s => s.id == shard && !s.readOnly), s"shard $shard not writable")
    val next = shards.map(_.id).max + 1
    val updated = shards.map(s => if (s.id == shard) s.copy(readOnly = true) else s) ++
      Seq(ShardInfo(next, readOnly = false), ShardInfo(next + 1, readOnly = false))
    Files.createDirectories(shardDir(project, store, next))
    Files.createDirectories(shardDir(project, store, next + 1))
    writeMeta(project, store, updated)
    (next, next + 1)
  }

  /** Stage one immutable segment data file into the shard dir. Invisible
    * to readers until a manifest references it. `segmentName` must be
    * unique per logical write and stable across retries: a task retry or
    * epoch replay re-stages the same name and the file is replaced
    * atomically in place.
    *
    * Segment file name: `<logicalName>-<minT>-<maxT>-<count>.jsonl` —
    * the embedded time bounds let time-range scans skip whole segments
    * with no data reads; record ORDER comes from the commit log, not
    * the file name. Returns the staged descriptor for commit. */
  def stageSegment(project: String, store: String, shard: Int,
      segmentName: String, records: Seq[LogRecord]): StagedSegment = {
    require(!segmentName.contains("/"), s"bad segment name $segmentName")
    require(records.forall(_.time >= 0), "record times must be >= 0")
    val dir = shardDir(project, store, shard)
    Files.createDirectories(dir)
    val mapper = new ObjectMapper()
    val sb = new StringBuilder
    records.foreach { r => sb.append(recordToJson(mapper, r)).append('\n') }
    val minT = records.map(_.time).minOption.getOrElse(0)
    val maxT = records.map(_.time).maxOption.getOrElse(0)
    val file = s"$segmentName-$minT-$maxT-${records.size}.jsonl"
    // a replayed logical segment must not change shape once committed
    committedFile(project, store, shard, segmentName).foreach { prior =>
      require(prior == file,
        s"replayed segment $segmentName is $file, committed as $prior")
    }
    val tmp = dir.resolve(s".$file.tmp")
    io {
      Files.write(tmp, sb.toString.getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, dir.resolve(file),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    StagedSegment(shard, file)
  }

  /** Atomically publish staged segments as one commit. Optimistic
    * versioning: the manifest is hard-linked into place as
    * `m-<version>.json` — link creation fails if the version is taken,
    * and the committer retries with the next number. Already-committed
    * segment files (an epoch replay) are skipped, keeping commit
    * idempotent and ordinals pinned. Within a commit, segments are
    * ordered by (shard, file name) — deterministic regardless of task
    * completion order. */
  def commitSegments(project: String, store: String,
      staged: Seq[StagedSegment]): Unit = {
    val mDir = manifestDir(project, store)
    Files.createDirectories(mDir)
    var done = false
    while (!done) {
      val committed = committedSet(project, store)
      val fresh = staged.filterNot(s => committed.contains((s.shard, s.file)))
        .distinct.sortBy(s => (s.shard, s.file))
      if (fresh.isEmpty) { done = true }
      else {
        val version = currentVersion(project, store) + 1
        val mapper = new ObjectMapper()
        val rootNode = mapper.createObjectNode()
        rootNode.put("version", version)
        val arr = rootNode.putArray("segments")
        fresh.foreach { s =>
          val n = arr.addObject(); n.put("shard", s.shard); n.put("file", s.file)
        }
        val tmp = mDir.resolve(s".m-$version.json.tmp-${System.nanoTime()}")
        io(Files.write(tmp, mapper.writeValueAsBytes(rootNode)))
        try {
          io(Files.createLink(mDir.resolve(f"m-$version%010d.json"), tmp))
          // The link can land in a version slot a concurrent compaction
          // just VACATED: if our listing raced the compactor's deletions
          // and missed its checkpoint, `version` can sit below the
          // checkpoint, the link finds the slot free (its old occupant
          // was deleted), and no fold will ever read the manifest. A
          // successful link is therefore not yet a durable commit —
          // verify the segments are visible in a validated fold, and if
          // a newer checkpoint superseded the slot without folding us,
          // delete the orphan and recommit at a fresh version.
          var verifying = true
          var attempt = 0
          while (verifying) {
            val view = manifestView(project, store)
            val visible = view.entries.toSet
            if (fresh.forall(s => visible.contains((s.shard, s.file)))) {
              verifying = false; done = true
            } else if (view.checkpointVersion > version || attempt > 64) {
              Files.deleteIfExists(mDir.resolve(f"m-$version%010d.json"))
              verifying = false // outer loop recommits the segments
            } else attempt += 1 // torn view missed our manifest: re-list
          }
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => // lost the race
        } finally Files.deleteIfExists(tmp)
      }
    }
    // long-running streams write one manifest per epoch: fold the
    // history once the delta chain grows past the threshold so reader
    // cost stays bounded without operator intervention
    if (manifestFiles(project, store).size > AutoCompactThreshold)
      compactManifests(project, store)
  }

  /** Delta-manifest count that triggers auto-compaction on commit. */
  val AutoCompactThreshold = 256

  /** Stage + commit in one call — the single-writer convenience path. */
  def appendSegment(project: String, store: String, shard: Int,
      segmentName: String, records: Seq[LogRecord]): Unit =
    commitSegments(project, store,
      Seq(stageSegment(project, store, shard, segmentName, records)))

  /** Delete staged-but-uncommitted segment files (an aborted job's
    * leftovers). Committed files are never touched. */
  def discardStaged(project: String, store: String,
      staged: Seq[StagedSegment]): Unit = {
    val committed = committedSet(project, store)
    staged.filterNot(s => committed.contains((s.shard, s.file))).foreach { s =>
      Files.deleteIfExists(shardDir(project, store, s.shard).resolve(s.file))
    }
  }

  /** Remove every data file no manifest references — the leftovers of
    * CRASHED jobs, which never reached abort(). Run only while no
    * writer is active: a concurrent job's staged-but-uncommitted
    * segments are indistinguishable from orphans (the store has no
    * clock to age-gate with, by design — determinism over convenience).
    * Returns the number of files removed. */
  def vacuumOrphans(project: String, store: String): Int = {
    val committed = committedSet(project, store)
    var removed = 0
    listShards(project, store).foreach { sh =>
      val dir = shardDir(project, store, sh.id)
      if (Files.isDirectory(dir)) {
        listDir(dir)
          .filter(n => n.endsWith(".jsonl") && !n.startsWith("."))
          .filterNot(n => committed.contains((sh.id, n)))
          .foreach { n => Files.deleteIfExists(dir.resolve(n)); removed += 1 }
      }
    }
    removed
  }

  /** Directory listing that CLOSES its stream — `Files.list` holds an
    * open directory fd until closed, and the manifest protocol lists on
    * every fold, so an unclosed stream here exhausts the process fd
    * table under load. */
  private def listDir(dir: java.nio.file.Path): Seq[String] = {
    val stream = Files.list(dir)
    try stream.iterator().asScala.map(_.getFileName.toString).toSeq
    finally stream.close()
  }

  case class Segment(fileName: String, logicalName: String,
      minTime: Int, maxTime: Int, count: Long)

  private def manifestFiles(project: String, store: String): Seq[String] = {
    val dir = manifestDir(project, store)
    if (!Files.isDirectory(dir)) return Seq.empty
    io(listDir(dir))
      .filter(n => n.startsWith("m-") && n.endsWith(".json"))
      .sorted // zero-padded version ⇒ commit order
  }

  private def manifestVersion(name: String): Long =
    name.stripPrefix("m-").stripSuffix(".json").toLong

  private def currentVersion(project: String, store: String): Long =
    manifestFiles(project, store).map(manifestVersion)
      .maxOption.getOrElse(0L)

  /** Current manifest head — the version a snapshot read pins
    * (`store.snapshotversion` / SQL `VERSION AS OF`). */
  def headVersion(project: String, store: String): Long =
    currentVersion(project, store)

  /** All committed (shard, file) pairs in commit order. A checkpoint
    * manifest (written by [[compactManifests]]) carries the full prefix
    * folded in, so reading starts at the LAST checkpoint and folds only
    * the delta manifests after it — O(commits since compaction), not
    * O(all commits ever).
    *
    * A compaction can delete superseded delta manifests between our
    * directory listing and the per-file reads; a reader that trips on
    * the deletion re-lists (bounded retries) and picks up the checkpoint
    * that replaced the deleted deltas — same entries, same order.
    * A torn listing (later manifest observed, earlier one missed) is
    * detected by the contiguity guard in [[viewFrom]] and also
    * re-lists. */
  private def committedEntries(project: String, store: String): Seq[(Int, String)] =
    manifestView(project, store).entries

  /** Highest committed manifest version (0 = empty store). The handle a
    * caller pins to read this exact snapshot later via [[shardEndsAt]]. */
  def latestVersion(project: String, store: String): Long =
    currentVersion(project, store)

  /** Per-shard END ordinals as of manifest `version` — the snapshot /
    * time-travel read surface. Because readers fold manifests in version
    * order and a record's ordinal is pinned by the first manifest that
    * listed it, the snapshot at `version` is exactly the ordinal prefix
    * [0, end) per shard — so a bounded scan capped at these ends is a
    * consistent point-in-time read, immune to concurrent appends.
    *
    * A version below the last compaction checkpoint is permanently
    * unreadable (its delta manifests were folded away and deleted, as
    * with Delta Lake VACUUM): fails loudly rather than silently reading
    * a different snapshot. Versions above the current head read as the
    * head (the usual "read at t > now" semantics). */
  def shardEndsAt(project: String, store: String, version: Long): Map[Int, Long] = {
    require(version >= 0, s"snapshot version must be >= 0, got $version")
    var attempt = 0
    while (attempt <= 64) {
      try {
        val files = manifestFiles(project, store)
        val pre = files.filter(manifestVersion(_) <= version)
        // An empty prefix under a nonempty manifest log means the
        // history at `version` is not listable (vacuously "valid" to
        // viewFrom) — treat it like a torn/compacted prefix below.
        val gone = pre.isEmpty && version >= 1 && files.nonEmpty
        (if (gone) None else viewFrom(project, store, pre)) match {
          case Some(view) =>
            // END ordinal = retention base + live counts (a shard whose
            // every segment expired still ends at its base)
            val counts = view.entries.groupBy(_._1).map { case (s, es) =>
              s -> es.map(e => parseSegment(e._2).count).sum
            }
            return (counts.keySet ++ view.bases.keySet).map { s =>
              s -> (view.bases.getOrElse(s, 0L) + counts.getOrElse(s, 0L))
            }.toMap
          case None =>
            // Either the prefix was compacted away (a checkpoint above
            // `version` subsumed and deleted its deltas — permanent) or
            // the listing raced a writer/compactor (transient: re-list).
            val mapper = new ObjectMapper()
            val compacted = files.filter(manifestVersion(_) > version).exists { f =>
              try {
                val t = mapper.readTree(io(Files.readAllBytes(
                  manifestDir(project, store).resolve(f))))
                t.get("checkpoint") != null && t.get("checkpoint").asBoolean()
              } catch { case _: java.nio.file.NoSuchFileException => false }
            }
            if (compacted) throw new IllegalArgumentException(
              s"snapshot version $version of $project/$store predates the " +
                "last manifest compaction and is no longer readable")
            attempt += 1
        }
      } catch {
        case _: java.nio.file.NoSuchFileException => attempt += 1
      }
    }
    throw new IllegalStateException(
      s"manifest listing for $project/$store torn after $attempt attempts")
  }

  /** One validated, untorn view of the manifest directory. `absorbed` =
    * (shard, file) pairs folded INTO merged segments by a past
    * [[compactSegments]] — no longer part of the ordinal fold, but
    * still "committed" for replay-idempotence purposes (a streaming
    * epoch replayed after its segments were merged away must be
    * skipped, not re-appended). */
  private case class ManifestView(files: Seq[String],
      entries: Seq[(Int, String)], checkpointVersion: Long,
      absorbed: Seq[(Int, String)], bases: Map[Int, Long])

  private def manifestView(project: String, store: String): ManifestView = {
    var attempt = 0
    while (true) {
      try {
        viewFrom(project, store, manifestFiles(project, store)) match {
          case Some(view) => return view
          case None => // torn listing — re-list for a consistent snapshot
            attempt += 1
            if (attempt > 64) throw new IllegalStateException(
              s"manifest listing for $project/$store torn after $attempt attempts")
        }
      } catch {
        case e: java.nio.file.NoSuchFileException =>
          attempt += 1
          if (attempt > 64) throw e
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Fold an explicit manifest-file listing (sorted = commit order) into
    * committed (shard, file) pairs, validating the listing is an untorn
    * snapshot first. Manifest versions are DENSE by construction (max+1
    * with collision-retry on the link), so the versions at or after the
    * last checkpoint must be contiguous, and when no checkpoint is
    * present the listing must start at version 1. A hole means the
    * directory iteration raced a writer and observed a later manifest
    * while missing an earlier one — folding such a listing would
    * silently drop the missed commit's segments. Returns None so the
    * caller re-lists. (A missed manifest ABOVE the observed max is
    * harmless: readers fold a consistent prefix, and a compactor
    * checkpointing at max+1 collides on the link and retries.) */
  private def viewFrom(project: String, store: String,
      files: Seq[String]): Option[ManifestView] = {
    val mDir = manifestDir(project, store)
    val mapper = new ObjectMapper()
    val trees = files.map(m =>
      mapper.readTree(io(Files.readAllBytes(mDir.resolve(m)))))
    val lastCkpt = trees.lastIndexWhere(t =>
      t.get("checkpoint") != null && t.get("checkpoint").asBoolean())
    val tailFiles = files.drop(math.max(lastCkpt, 0))
    val versions = tailFiles.map(manifestVersion)
    val untorn =
      versions.lazyZip(versions.drop(1)).forall((a, b) => b == a + 1) &&
        (lastCkpt >= 0 || versions.headOption.forall(_ == 1L))
    if (!untorn) None
    else Some(ManifestView(
      files,
      trees.drop(math.max(lastCkpt, 0)).flatMap { tree =>
        tree.get("segments").elements().asScala.map { n =>
          (n.get("shard").asInt(), n.get("file").asText())
        }.toSeq
      },
      if (lastCkpt >= 0) manifestVersion(files(lastCkpt)) else 0L,
      // only checkpoints carry an absorbed list (written by
      // compactSegments, carried forward by every later checkpoint)
      if (lastCkpt < 0) Seq.empty
      else Option(trees(lastCkpt).get("absorbed")).toSeq.flatMap { a =>
        a.elements().asScala.map { n =>
          (n.get("shard").asInt(), n.get("file").asText())
        }.toSeq
      },
      // per-shard base ordinals (written by expireSegments; absent = 0)
      if (lastCkpt < 0) Map.empty
      else Option(trees(lastCkpt).get("bases")).map { b =>
        b.asInstanceOf[ObjectNode].properties().asScala
          .map(e => e.getKey.toInt -> e.getValue.asLong()).toMap
      }.getOrElse(Map.empty)))
  }

  /** Fold the whole manifest history into one checkpoint manifest at the
    * next version (same optimistic link protocol as commits — safe under
    * racing committers), then delete the superseded delta manifests.
    * Readers that raced the deletion still see a consistent prefix:
    * every entry they could read from the old manifests is in the
    * checkpoint, in the same order. Run periodically (e.g. every ~1e3
    * epochs) to bound per-trigger manifest reads. */
  def compactManifests(project: String, store: String): Unit = {
    val mDir = manifestDir(project, store)
    if (!Files.isDirectory(mDir)) return
    var done = false
    while (!done) {
      // ONE directory listing is the snapshot: both the folded entries
      // and the checkpoint's version derive from it. A manifest
      // committed by a racing writer after this listing carries a
      // version >= ours and collides on the link below — the loser
      // retries. A TORN listing (directory iteration concurrent with a
      // writer's createLink can observe a later manifest while missing
      // an earlier one) is rejected by foldValidated's contiguity
      // guard — versions are dense, so a hole proves the listing is not
      // a snapshot — and we re-list rather than checkpoint without the
      // missed commit.
      val folded = manifestFiles(project, store)
      if (folded.isEmpty) return
      val viewOpt =
        try viewFrom(project, store, folded)
        catch {
          // a racing compactor deleted part of our snapshot: re-list
          case _: java.nio.file.NoSuchFileException => None
        }
      viewOpt match {
        case None => // retry with a fresh snapshot
        case Some(view) =>
          // absorbed + bases (replay memory, retention bases) survive
          // every later checkpoint
          val version = folded.map(manifestVersion).max + 1
          if (writeCheckpoint(project, store, version, view.entries,
              view.absorbed, view.bases)) {
            done = true
            folded.foreach(f => Files.deleteIfExists(mDir.resolve(f)))
          } // else lost the race: retry
      }
    }
  }

  /** Write a checkpoint manifest at `version` via the optimistic link
    * protocol. Returns true if the link landed (caller then owns
    * cleanup of superseded files), false on a version collision. */
  private def writeCheckpoint(project: String, store: String, version: Long,
      entries: Seq[(Int, String)], absorbed: Seq[(Int, String)],
      bases: Map[Int, Long]): Boolean = {
    val mDir = manifestDir(project, store)
    val mapper = new ObjectMapper()
    val rootNode = mapper.createObjectNode()
    rootNode.put("version", version)
    rootNode.put("checkpoint", true)
    val arr = rootNode.putArray("segments")
    entries.foreach { case (shard, file) =>
      val n = arr.addObject(); n.put("shard", shard); n.put("file", file)
    }
    if (absorbed.nonEmpty) {
      val ab = rootNode.putArray("absorbed")
      absorbed.foreach { case (shard, file) =>
        val n = ab.addObject(); n.put("shard", shard); n.put("file", file)
      }
    }
    if (bases.nonEmpty) {
      val b = rootNode.putObject("bases")
      bases.toSeq.sortBy(_._1).foreach { case (shard, base) =>
        b.put(shard.toString, base)
      }
    }
    val tmp = mDir.resolve(s".m-$version.json.tmp-${System.nanoTime()}")
    io(Files.write(tmp, mapper.writeValueAsBytes(rootNode)))
    try {
      io(Files.createLink(mDir.resolve(f"m-$version%010d.json"), tmp))
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
    } finally Files.deleteIfExists(tmp)
  }

  /** Time-based retention: drop every shard's PREFIX of segments whose
    * embedded maxTime < `beforeTime` — the log-store analog of Kafka
    * retention / Delta VACUUM, for aging out cold data at scale.
    *
    * Only a PREFIX expires: ordinals are positional, so dropping from
    * the middle would renumber later records. Instead each shard gets a
    * BASE ordinal (checkpoint `bases`): surviving records keep the
    * ordinals they always had, `earliest` resolves to the base, and a
    * checkpointed cursor below the base simply reads what still exists
    * (expired data is skipped — retention semantics, not an error).
    * Expired (shard, file) pairs join the absorbed list, so a streaming
    * epoch replayed after its output expired is still deduped, never
    * resurrected. Returns the number of segments expired. */
  def expireSegments(project: String, store: String, beforeTime: Int): Int = {
    val mDir = manifestDir(project, store)
    if (!Files.isDirectory(mDir)) return 0
    while (true) {
      val folded = manifestFiles(project, store)
      if (folded.isEmpty) return 0
      val viewOpt =
        try viewFrom(project, store, folded)
        catch { case _: java.nio.file.NoSuchFileException => None }
      viewOpt match {
        case None => // torn/raced listing: re-list
        case Some(view) =>
          val expired = mutable.Buffer[(Int, String)]()
          val newBases = mutable.Map[Int, Long]() ++ view.bases
          view.entries.groupBy(_._1).foreach { case (shard, es) =>
            val pre = es.map(_._2).takeWhile(f =>
              parseSegment(f).maxTime < beforeTime)
            if (pre.nonEmpty) {
              expired ++= pre.map(f => (shard, f))
              newBases(shard) = newBases.getOrElse(shard, 0L) +
                pre.map(parseSegment(_).count).sum
            }
          }
          if (expired.isEmpty) return 0
          val gone = expired.toSet
          val newEntries = view.entries.filterNot(gone.contains)
          val absorbed = (view.absorbed ++ expired).distinct
          val version = folded.map(manifestVersion).max + 1
          if (writeCheckpoint(project, store, version, newEntries,
              absorbed, newBases.toMap)) {
            folded.foreach(f => Files.deleteIfExists(mDir.resolve(f)))
            expired.foreach { case (shard, f) =>
              Files.deleteIfExists(shardDir(project, store, shard).resolve(f))
            }
            return expired.size
          } // else lost the race: retry on a fresh snapshot
      }
    }
    0 // unreachable
  }

  /** First live ordinal of a shard (0 until retention moves it). The
    * `earliest` offset resolution target. */
  def shardStart(project: String, store: String, shard: Int): Long =
    manifestView(project, store).bases.getOrElse(shard, 0L)

  /** Every shard's (base ordinal, live segments) from ONE manifest
    * fold — the whole-store analog of [[shardView]]. Ordinal math that
    * spans shards (stat pushdown) must read bases and listings from a
    * single view: separate per-shard calls can straddle a concurrent
    * expiry or compaction and misalign the two. */
  def storeView(project: String,
      store: String): Map[Int, (Long, Seq[Segment])] = {
    val view = manifestView(project, store)
    val segs = view.entries.groupBy(_._1)
    (view.bases.keySet ++ segs.keySet ++
        listShards(project, store).map(_.id)).map { s =>
      s -> (view.bases.getOrElse(s, 0L),
        segs.getOrElse(s, Seq.empty).map(e => parseSegment(e._2)))
    }.toMap
  }

  /** Bin-pack small consecutive segments into larger merged ones, per
    * shard — the OPTIMIZE counterpart to [[compactManifests]], aimed at
    * the small-files problem: a streaming sink writes one segment per
    * (epoch, task), so a long-lived stream accumulates thousands of
    * tiny files and every scan pays per-file open/parse overhead.
    *
    * Safety rests on two invariants:
    *   - ORDINALS ARE PRESERVED: a merged segment replaces consecutive
    *     segments of one shard in place, keeping record order, so
    *     cursors, snapshot ends, bounded scans, and in-flight streaming
    *     offsets all mean exactly what they meant before. Readers that
    *     listed the old layout and trip on a deleted file re-list and
    *     resume at their current ordinal (see [[read]]). (The cosmetic
    *     `__sequence_number__` "<segment>-<offset>" strings are derived
    *     from segment BOUNDARIES and do change across a rewrite —
    *     ordinals, not sequence strings, are the stable identity.)
    *   - REPLAY IDEMPOTENCE SURVIVES: the merged-away (shard, file)
    *     pairs move to the checkpoint's `absorbed` list, which
    *     [[commitSegments]]' duplicate-skip and [[stageSegment]]'s
    *     shape guard consult — a streaming epoch replayed after its
    *     segments were merged is skipped, not re-appended.
    *
    * Commit uses the same single-snapshot optimistic checkpoint
    * protocol as [[compactManifests]]: one validated listing feeds both
    * the rewritten entry list and the version; a racing commit collides
    * on the version link and one side retries. Superseded delta
    * manifests and replaced data files are deleted only after the link
    * lands. Runs of >= 2 consecutive segments are merged while their
    * record total stays <= `targetRecords`; segments at or above the
    * target are left alone. Returns the number of merged segments
    * written (0 = nothing worth merging). */
  /** Test seam: runs after a compaction attempt has staged its merged
    * files, before it tries to commit — lets a spec deterministically
    * interleave a concurrent compactor into the race window. */
  private[graft] var onCompactStaged: () => Unit = () => ()

  def compactSegments(project: String, store: String,
      targetRecords: Long = 1L << 20): Int = {
    require(targetRecords > 0, s"targetRecords $targetRecords must be > 0")
    val mDir = manifestDir(project, store)
    if (!Files.isDirectory(mDir)) return 0
    val mapper = new ObjectMapper()
    while (true) {
      val folded = manifestFiles(project, store)
      if (folded.isEmpty) return 0
      val viewOpt =
        try viewFrom(project, store, folded)
        catch { case _: java.nio.file.NoSuchFileException => None }
      viewOpt match {
        case None => // torn/raced listing: re-list
        case Some(view) =>
          // greedy consecutive runs per shard: >= 2 segments, <= target
          val runOf = mutable.Map[(Int, String), Int]()
          val runFiles = mutable.Buffer[(Int, Seq[String])]()
          view.entries.groupBy(_._1).foreach { case (shard, es) =>
            var cur = mutable.Buffer[String]()
            var total = 0L
            def flush(): Unit = {
              if (cur.size >= 2) {
                val id = runFiles.size
                runFiles += ((shard, cur.toSeq))
                cur.foreach(f => runOf((shard, f)) = id)
              }
              cur = mutable.Buffer[String](); total = 0L
            }
            es.map(_._2).foreach { f =>
              val c = parseSegment(f).count
              if (c >= targetRecords) flush()
              else {
                if (total + c > targetRecords) flush()
                cur += f; total += c
              }
            }
            flush()
          }
          if (runFiles.isEmpty) return 0
          // stage each merged segment (constituents read in order); the
          // logical name is a digest of the constituent files, so a
          // crashed attempt re-stages the same name atomically
          val mergedName = runFiles.zipWithIndex.map { case ((shard, files), id) =>
            val records = files.flatMap { f =>
              io(Files.readAllLines(
                  shardDir(project, store, shard).resolve(f))).asScala
                .map(l => jsonToRecord(mapper, l))
            }
            val digest = java.security.MessageDigest.getInstance("MD5")
              .digest((s"$shard|" + files.mkString("|"))
                .getBytes(StandardCharsets.UTF_8))
            val hex = digest.take(8).map(b => f"$b%02x").mkString
            id -> stageSegment(project, store, shard, s"opt$hex", records).file
          }.toMap
          // rewrite the entry list: a run's first member becomes the
          // merged file, later members drop out, everything else stays
          val emitted = mutable.Set[Int]()
          val newEntries = view.entries.flatMap { case (shard, f) =>
            runOf.get((shard, f)) match {
              case Some(id) =>
                if (emitted.add(id)) Some((shard, mergedName(id))) else None
              case None => Some((shard, f))
            }
          }
          val absorbed = (view.absorbed ++
            runFiles.flatMap { case (shard, files) =>
              files.map(f => (shard, f)) }).distinct
          val version = folded.map(manifestVersion).max + 1
          onCompactStaged()
          if (writeCheckpoint(project, store, version, newEntries,
              absorbed, view.bases)) {
            // committed: superseded deltas and replaced data files go
            folded.foreach(f => Files.deleteIfExists(mDir.resolve(f)))
            runFiles.foreach { case (shard, files) =>
              files.foreach(f => Files.deleteIfExists(
                shardDir(project, store, shard).resolve(f)))
            }
            return runFiles.size
          } else {
            // Lost the race. Merged names are DETERMINISTIC (digest of
            // constituents), so a concurrent compactor of the same view
            // staged — and may have just committed — these exact files;
            // unconditional cleanup would delete its committed data.
            // Only files still absent from the committed view are ours
            // to remove; then retry on a fresh snapshot.
            val committed = committedSet(project, store)
            runFiles.zipWithIndex.foreach { case ((shard, _), id) =>
              if (!committed.contains((shard, mergedName(id))))
                Files.deleteIfExists(
                  shardDir(project, store, shard).resolve(mergedName(id)))
            }
          }
      }
    }
    0 // unreachable
  }

  /** Everything ever committed — live manifest entries PLUS segments a
    * compaction absorbed into merged files. Replay idempotence
    * (commitSegments' skip, stageSegment's shape guard, discardStaged)
    * must use this set, not the live entries, or an epoch replayed
    * after its segments were merged away would re-append its data. */
  private def committedSet(project: String, store: String): Set[(Int, String)] = {
    val view = manifestView(project, store)
    (view.entries ++ view.absorbed).toSet
  }

  private def committedFile(project: String, store: String, shard: Int,
      logicalName: String): Option[String] = {
    val view = manifestView(project, store)
    (view.entries ++ view.absorbed).collectFirst {
      case (s, f) if s == shard && f.startsWith(logicalName + "-") &&
        parseSegment(f).logicalName == logicalName => f
    }
  }

  private def parseSegment(fileName: String): Segment = {
    val parts = fileName.stripSuffix(".jsonl").split("-")
    Segment(fileName, parts.dropRight(3).mkString("-"),
      parts(parts.length - 3).toInt, parts(parts.length - 2).toInt,
      parts.last.toLong)
  }

  /** A shard's committed segments in commit order — the record sequence
    * cursors index into. Pure function of the manifest log: stable under
    * concurrent writers and racing readers. */
  def listSegments(project: String, store: String, shard: Int): Seq[Segment] =
    committedEntries(project, store)
      .collect { case (s, f) if s == shard => parseSegment(f) }

  /** One consistent (base ordinal, live segments) pair for a shard —
    * ordinal math must never mix a base and a listing from two
    * different manifest views (an expiry between them would double- or
    * zero-count the dropped prefix). */
  private def shardView(project: String, store: String,
      shard: Int): (Long, Seq[Segment]) = {
    val view = manifestView(project, store)
    (view.bases.getOrElse(shard, 0L),
      view.entries.collect { case (s, f) if s == shard => parseSegment(f) })
  }

  /** Total records ever committed to a shard = END cursor ordinal
    * (retention moves the START, never the end). */
  def shardEnd(project: String, store: String, shard: Int): Long = {
    val (base, segs) = shardView(project, store, shard)
    base + segs.map(_.count).sum
  }

  /** Base ordinal of each committed segment in commit order — the
    * cursor value of the segment's first record. */
  def segmentBases(project: String, store: String, shard: Int): Array[Long] = {
    val (base, segs) = shardView(project, store, shard)
    val bases = new Array[Long](segs.length)
    var acc = base; var i = 0
    while (i < segs.length) { bases(i) = acc; acc += segs(i).count; i += 1 }
    bases
  }

  /** First ordinal whose record time >= t (for cursor-from-time);
    * shardEnd if none. Segments whose embedded maxTime < t are skipped
    * from the listing alone — only the first candidate segment onward
    * is actually scanned. */
  def cursorAtTime(project: String, store: String, shard: Int, t: Int): Long =
    retryOnMissingFile(s"cursorAtTime $project/$store/$shard")(
      cursorAtTimeOnce(project, store, shard, t))

  /** Bounded re-list retry for scans that read data files from a
    * listing a racing [[compactSegments]] may have invalidated. */
  private def retryOnMissingFile[T](what: String)(op: => T): T = {
    var attempts = 0
    while (true) {
      try return op
      catch {
        case e: java.nio.file.NoSuchFileException =>
          attempts += 1
          if (attempts > 64) throw e
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def cursorAtTimeOnce(project: String, store: String, shard: Int,
      t: Int): Long = {
    val (base, segs) = shardView(project, store, shard)
    var ordinal = base
    val mapper = new ObjectMapper()
    segs.foreach { seg =>
      if (seg.maxTime < t) ordinal += seg.count
      else {
        val lines = io(Files.readAllLines(
          shardDir(project, store, shard).resolve(seg.fileName))).asScala
        lines.foreach { line =>
          if (mapper.readTree(line).get("time").asInt() >= t) return ordinal
          ordinal += 1
        }
      }
    }
    ordinal
  }

  /** Read records with ordinals in [from, until). An optional time range
    * [fromT, untilT) additionally (a) skips whole segments whose embedded
    * [minTime, maxTime] bounds are disjoint from it — a listing-only
    * decision, no data reads — and (b) filters surviving records exactly.
    * Ordinal numbering is unaffected by skipping. Segments stream through
    * a buffered reader (no whole-file materialization) and lines that
    * fall outside the ordinal range are skipped without parsing.
    *
    * Self-healing under [[compactSegments]]: a racing compaction can
    * delete a listed file before this iterator opens it. Ordinals are
    * stable across compaction (merges preserve per-shard order), so the
    * iterator re-lists and resumes at the next unread ordinal — each
    * record is still produced exactly once. */
  def read(project: String, store: String, shard: Int,
      from: Long, until: Long,
      timeRange: Option[(Int, Int)] = None): Iterator[(Long, LogRecord)] =
    new Iterator[(Long, LogRecord)] {
      private var cur = from
      private var attempts = 0
      private var inner = readOnce(project, store, shard, cur, until, timeRange)
      private def heal(): Unit = {
        attempts += 1
        if (attempts > 64) throw new IllegalStateException(
          s"segment listing for $project/$store shard $shard raced " +
            s"compaction $attempts times")
        inner = readOnce(project, store, shard, cur, until, timeRange)
      }
      override def hasNext: Boolean = {
        while (true) {
          try return inner.hasNext
          catch { case _: java.nio.file.NoSuchFileException => heal() }
        }
        false
      }
      override def next(): (Long, LogRecord) = {
        while (true) {
          try {
            val r = inner.next()
            cur = r._1 + 1
            return r
          } catch { case _: java.nio.file.NoSuchFileException => heal() }
        }
        throw new IllegalStateException("unreachable")
      }
    }

  private def readOnce(project: String, store: String, shard: Int,
      from: Long, until: Long,
      timeRange: Option[(Int, Int)]): Iterator[(Long, LogRecord)] = {
    val mapper = new ObjectMapper()
    val dir = shardDir(project, store, shard)
    val (shardBase, segs) = shardView(project, store, shard)
    var base = shardBase // ordinals below it were expired by retention
    val out = mutable.Buffer[(String, Long)]() // (file, segBase)
    segs.foreach { seg =>
      val ordOverlap = base < until && base + seg.count > from
      val timeOverlap = timeRange.forall { case (fromT, untilT) =>
        seg.maxTime >= fromT && seg.minTime < untilT
      }
      if (ordOverlap && timeOverlap) out += ((seg.fileName, base))
      base += seg.count
    }
    val inRange = out.iterator.flatMap { case (file, segBase) =>
      val reader = io(Files.newBufferedReader(dir.resolve(file), StandardCharsets.UTF_8))
      new Iterator[(Long, String)] {
        private var ord = segBase
        private var line: String = advance()
        private def advance(): String = {
          var l = reader.readLine()
          while (l != null && ord < from) { ord += 1; l = reader.readLine() }
          if (l == null || ord >= until) { reader.close(); null } else l
        }
        override def hasNext: Boolean = line != null
        override def next(): (Long, String) = {
          val r = (ord, line); ord += 1; line = advance(); r
        }
      }.map { case (ord, l) => (ord, jsonToRecord(mapper, l)) }
    }
    timeRange match {
      case Some((fromT, untilT)) =>
        inRange.filter { case (_, r) => r.time >= fromT && r.time < untilT }
      case None => inRange
    }
  }

  /** Live source-config override (reference O12 dynamic config,
    * DynamicConfigManager.scala:30-120 — ZK watcher there, a per-trigger
    * re-read of `<store>/config.json` here; same contract: ops can
    * retune a running stream without restarting it). */
  def writeSourceConfig(project: String, store: String,
      config: Map[String, String]): Unit = {
    val mapper = new ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("version", "v1")
    val c = root.putObject("config")
    config.foreach { case (k, v) => c.put(k, v) }
    Files.write(storeDir(project, store).resolve("config.json"),
      mapper.writeValueAsBytes(root))
  }

  /** Consumer-group offset commit (reference CheckpointManager.java:
    * 18-137 + DirectLoghubInputDStream.commitAsync, :227-241): external
    * progress interop — a named group's per-shard high-water ordinals,
    * readable by other tooling and usable to resume a new query. The
    * group view is MONOTONIC per shard, like the reference's
    * checkCursorLessThan guard: a stale commit (replayed epoch, late
    * listener event) never regresses the group.
    *
    * Monotonicity is structural, not lock-based: a commit APPENDS an
    * immutable entry file under `groups/<group>/` and the view is the
    * per-shard MAX over all entries — there is no read-modify-write, so
    * concurrent committers (two listeners, two store handles, two JVMs)
    * cannot lose each other's progress the way a re-read-and-overwrite
    * scheme would. Max-merge is commutative/associative/idempotent, so
    * entry arrival order never matters. Opportunistic compaction folds
    * entries past a threshold into one (the merged entry lands via
    * ATOMIC_MOVE before its absorbed inputs are deleted, and a racing
    * compactor just writes an equivalent fold of a subset — deletes are
    * idempotent, readers retry a torn listing). Returns the folded view
    * including this commit. */
  def commitGroupOffsets(project: String, store: String, group: String,
      offsets: Map[Int, Long]): Map[Int, Long] = {
    val dir = groupDir(project, store, group)
    Files.createDirectories(dir)
    writeGroupEntry(dir, offsets)
    val entries = listGroupEntries(dir)
    if (entries.size > GroupCompactThreshold) compactGroupEntries(dir, entries)
    foldGroupEntries(dir)
  }

  /** A group's committed per-shard ordinals; empty if never committed. */
  def readGroupOffsets(project: String, store: String,
      group: String): Map[Int, Long] =
    foldGroupEntries(groupDir(project, store, group))

  private val GroupCompactThreshold = 32

  private def groupDir(project: String, store: String,
      group: String): java.nio.file.Path = {
    require(group.matches("[A-Za-z0-9._-]+"), s"invalid group name '$group'")
    storeDir(project, store).resolve("groups").resolve(group)
  }

  private def writeGroupEntry(dir: java.nio.file.Path,
      offsets: Map[Int, Long]): Unit = {
    val mapper = new ObjectMapper()
    val root = mapper.createObjectNode()
    val o = root.putObject("offsets")
    offsets.toSeq.sortBy(_._1).foreach { case (s, v) => o.put(s.toString, v) }
    // unique name: nanos + thread id + random suffix — entries are
    // append-only, so uniqueness is all that's needed (no ordering)
    val name = s"c-${System.nanoTime()}-${Thread.currentThread().getId}-" +
      s"${scala.util.Random.nextInt(Int.MaxValue)}.json"
    val tmp = dir.resolve(s".$name.tmp")
    Files.write(tmp, mapper.writeValueAsBytes(root))
    Files.move(tmp, dir.resolve(name),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  private def listGroupEntries(dir: java.nio.file.Path): Seq[String] = {
    if (!Files.exists(dir)) return Seq.empty
    val s = Files.list(dir)
    try s.iterator().asScala.map(_.getFileName.toString)
      .filter(n => n.startsWith("c-") && n.endsWith(".json")).toSeq
    finally s.close()
  }

  private def readGroupEntry(dir: java.nio.file.Path,
      name: String): Option[Map[Int, Long]] =
    try {
      val n = new ObjectMapper()
        .readTree(Files.readAllBytes(dir.resolve(name))).get("offsets")
      if (n == null) Some(Map.empty)
      else Some(n.asInstanceOf[ObjectNode].properties().asScala
        .map(e => e.getKey.toInt -> e.getValue.asLong()).toMap)
    } catch { // deleted by a concurrent compactor — its fold covers it
      case _: java.nio.file.NoSuchFileException => None
    }

  private def foldGroupEntries(dir: java.nio.file.Path): Map[Int, Long] = {
    var attempt = 0
    while (true) {
      val names = listGroupEntries(dir)
      val reads = names.map(n => n -> readGroupEntry(dir, n))
      // a missing entry means a compactor merged-and-deleted it while we
      // listed; its merged replacement may postdate our listing — relist
      if (reads.forall(_._2.isDefined))
        return reads.flatMap(_._2.get).groupBy(_._1)
          .map { case (s, vs) => s -> vs.map(_._2).max }
      attempt += 1
      if (attempt > 64) throw new IllegalStateException(
        s"group listing at $dir torn after $attempt attempts")
    }
    throw new IllegalStateException("unreachable")
  }

  private def compactGroupEntries(dir: java.nio.file.Path,
      names: Seq[String]): Unit = {
    val folded = names.flatMap(n => readGroupEntry(dir, n))
    if (folded.isEmpty) return
    val merged = folded.flatten.groupBy(_._1)
      .map { case (s, vs) => s -> vs.map(_._2).max }
    // merged entry FIRST (atomic), absorbed inputs after: a crash or
    // race in between leaves duplicates, which max-merge absorbs
    writeGroupEntry(dir, merged)
    names.foreach { n =>
      try Files.deleteIfExists(dir.resolve(n))
      catch { case _: java.io.IOException => () }
    }
  }

  /** Declared-schema metadata for the SQL catalog surface
    * ([[graft.connector.LogServiceCatalog]]): a store is wire-level
    * schemaless (string key/values), but a CREATE TABLE can pin the
    * typed read/write schema, persisted as DDL next to meta.json so
    * every session resolves the same table shape. */
  def writeTableSchema(project: String, store: String, ddl: String): Unit =
    Files.write(storeDir(project, store).resolve("schema.ddl"),
      ddl.getBytes(StandardCharsets.UTF_8))

  def readTableSchema(project: String, store: String): Option[String] = {
    val p = storeDir(project, store).resolve("schema.ddl")
    if (Files.exists(p)) Some(new String(Files.readAllBytes(p),
      StandardCharsets.UTF_8)) else None
  }

  def storeExists(project: String, store: String): Boolean =
    Files.exists(storeDir(project, store).resolve("meta.json"))

  def listProjects(): Seq[String] = {
    val rootPath = Paths.get(root)
    if (!Files.exists(rootPath)) return Seq.empty
    val s = Files.list(rootPath)
    try s.iterator().asScala.filter(Files.isDirectory(_))
      .map(_.getFileName.toString).toSeq.sorted
    finally s.close()
  }

  def listStores(project: String): Seq[String] = {
    val p = Paths.get(root, project)
    if (!Files.exists(p)) return Seq.empty
    val s = Files.list(p)
    try s.iterator().asScala
      .filter(d => Files.exists(d.resolve("meta.json")))
      .map(_.getFileName.toString).toSeq.sorted
    finally s.close()
  }

  /** Irreversibly delete a store (catalog DROP TABLE). */
  def dropStore(project: String, store: String): Boolean = {
    val dir = storeDir(project, store)
    if (!Files.exists(dir)) return false
    val s = Files.walk(dir)
    try s.sorted(java.util.Comparator.reverseOrder())
      .iterator().asScala.foreach(Files.deleteIfExists(_))
    finally s.close()
    true
  }

  def readSourceConfig(project: String, store: String): Map[String, String] = {
    val p = storeDir(project, store).resolve("config.json")
    if (!Files.exists(p)) return Map.empty
    val mapper = new ObjectMapper()
    val n = mapper.readTree(Files.readAllBytes(p)).get("config")
    if (n == null) Map.empty
    else n.asInstanceOf[ObjectNode].properties().asScala
      .map(e => e.getKey -> e.getValue.asText()).toMap
  }

  /** Exact per-shard record count with time in [fromT, untilT) — the
    * histogram primitive behind admission control (reference O4,
    * LoghubOffsetReader.scala:155-220; ours is exact, not bucketed).
    * Segments fully inside the range are counted from their embedded
    * metadata; fully outside are skipped — only boundary-straddling
    * segments are scanned. */
  def countInTimeRange(project: String, store: String, shard: Int,
      fromT: Int, untilT: Int): Long =
    retryOnMissingFile(s"countInTimeRange $project/$store/$shard")(
      countInTimeRangeOnce(project, store, shard, fromT, untilT))

  private def countInTimeRangeOnce(project: String, store: String, shard: Int,
      fromT: Int, untilT: Int): Long = {
    val mapper = new ObjectMapper()
    val dir = shardDir(project, store, shard)
    listSegments(project, store, shard).map { seg =>
      if (seg.minTime >= untilT || seg.maxTime < fromT) 0L
      else if (seg.minTime >= fromT && seg.maxTime < untilT) seg.count
      else Files.readAllLines(dir.resolve(seg.fileName)).asScala.count { line =>
        val t = mapper.readTree(line).get("time").asInt()
        t >= fromT && t < untilT
      }.toLong
    }.sum
  }
}

object EmbeddedLogStore {
  private val B64 = java.util.Base64.getEncoder
  private val B64D = java.util.Base64.getDecoder

  /** Cursors are base64 ordinals, like the reference's base64 numeric
    * cursors (ShardUtils.decodeCursor, ShardUtils.scala:8-11). */
  def encodeCursor(ordinal: Long): String =
    B64.encodeToString(ordinal.toString.getBytes(StandardCharsets.UTF_8))
  def decodeCursor(cursor: String): Long =
    new String(B64D.decode(cursor), StandardCharsets.UTF_8).toLong

  /** Direct string serialization — ~3x less allocation than building a
    * Jackson tree per record on the hot write path; Jackson still parses
    * on read (tolerant, well-tested). */
  private[store] def recordToJson(mapper: ObjectMapper, r: LogRecord): String = {
    val sb = new StringBuilder(64)
    sb.append("{\"time\":").append(r.time)
    sb.append(",\"topic\":"); appendJsonString(sb, r.topic)
    sb.append(",\"source\":"); appendJsonString(sb, r.source)
    sb.append(",\"tags\":{")
    var first = true
    r.tags.foreach { case (k, v) =>
      if (!first) sb.append(',')
      first = false
      appendJsonString(sb, k); sb.append(':'); appendJsonString(sb, v)
    }
    sb.append("},\"contents\":{")
    first = true
    r.contents.foreach { case (k, v) =>
      if (!first) sb.append(',')
      first = false
      appendJsonString(sb, k); sb.append(':'); appendJsonString(sb, v)
    }
    sb.append("}}")
    sb.toString
  }

  private def appendJsonString(sb: StringBuilder, s: String): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.append('"')
  }

  private[store] def jsonToRecord(mapper: ObjectMapper, line: String): LogRecord = {
    // fast path first: our own writer's output shape; any surprise falls
    // back to the tolerant Jackson parse (differential-tested in
    // StoreManifestSpec — both must agree wherever the fast path accepts)
    val fast = FastJsonl.tryParse(line)
    if (fast != null) return fast
    val n = mapper.readTree(line)
    def toMap(field: String): Map[String, String] = {
      val node = n.get(field)
      if (node == null) Map.empty
      else node.asInstanceOf[ObjectNode].properties().asScala
        .map(e => e.getKey -> e.getValue.asText()).toMap
    }
    LogRecord(n.get("time").asInt(), n.get("topic").asText(""),
      n.get("source").asText(""), toMap("tags"), toMap("contents"))
  }
}
