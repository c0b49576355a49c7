package graft.api

import graft.store.EmbeddedLogStore

/** Operator CLI for O12 dynamic config — the counterpart of the
  * reference's config-writer tool (UpdateSourceConfig.scala:22-68,
  * `--zookeeper/--log-project/--log-store/--config key:value` onto a ZK
  * node watched by DynamicConfigManager). Here the watched medium is the
  * store's `config.json`, which [[graft.connector.LogMicroBatchStream]]
  * re-reads every trigger: running
  *
  * {{{
  * runMain graft.api.UpdateSourceConfig --root /data/stores \
  *   --project p --store s --config maxoffsetspertrigger:500
  * }}}
  *
  * retunes a live stream's admission budget before its next micro-batch,
  * no restart. Read-merge-write: only the named key changes, other live
  * overrides survive. `key:` (empty value) deletes the key — restoring
  * the reader-option default, which the reference tool cannot do.
  */
object UpdateSourceConfig {

  private val Usage =
    """usage: UpdateSourceConfig --root <storeRoot> --project <name>
      |         --store <name> --config <key>:<value> [--config k:v ...]
      |A trailing empty value (`key:`) removes the key.""".stripMargin

  def main(args: Array[String]): Unit = run(args, println)

  /** Testable entry: applies the update and reports via `out`. */
  def run(args: Array[String], out: String => Unit): Unit = {
    val flags = scala.collection.mutable.Map[String, String]()
    val configs = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--help" => out(Usage); return
        case "--config" =>
          require(i + 1 < args.length, s"--config needs a value\n$Usage")
          configs += args(i + 1); i += 2
        case f @ ("--root" | "--project" | "--store") =>
          require(i + 1 < args.length, s"$f needs a value\n$Usage")
          flags(f.drop(2)) = args(i + 1); i += 2
        case other =>
          throw new IllegalArgumentException(s"unknown flag $other\n$Usage")
      }
    }
    val missing = Seq("root", "project", "store").filterNot(flags.contains)
    require(missing.isEmpty,
      s"missing ${missing.map("--" + _).mkString(", ")}\n$Usage")
    require(configs.nonEmpty, s"at least one --config required\n$Usage")
    val updates = configs.map { c =>
      val sep = c.indexOf(':')
      require(sep > 0, s"--config must be key:value, got '$c'\n$Usage")
      c.substring(0, sep) -> c.substring(sep + 1)
    }
    val store = new EmbeddedLogStore(flags("root"))
    val before = store.readSourceConfig(flags("project"), flags("store"))
    val after = updates.foldLeft(before) { case (m, (k, v)) =>
      if (v.isEmpty) m - k else m.updated(k, v)
    }
    store.writeSourceConfig(flags("project"), flags("store"), after)
    out(s"${flags("project")}/${flags("store")} config: " +
      after.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString(", "))
  }
}
