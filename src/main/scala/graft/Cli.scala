package graft

import java.io.{BufferedReader, PrintStream}

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.chain.MetadataChain
import graft.dataset.Dataset
import graft.ingest.IngestWriter
import graft.maintenance.Maintenance
import graft.operators.Export
import graft.query.QueryService

/**
 * Thin command-line front-end over the library services — the daily-driver
 * surface the reference exposes as its CLI (`kamu sql/tail/ingest/verify/...`,
 * src/app/cli + e2e/app/cli/repo-tests command suites). One subcommand per
 * service call; all I/O is injectable so the whole surface is spec-testable
 * with scripted stdin/stdout.
 *
 * Usage: graft.Cli [--workspace DIR] <command> [args]
 *
 *   list                          datasets in the workspace
 *   add MANIFEST.json [ISO8601]   create a dataset from a DatasetSnapshot
 *                                 manifest (kamu add, add_command.rs)
 *   sql -c STATEMENT              run one statement (CSV to stdout)
 *   sql                           REPL: one statement per stdin line
 *   tail DATASET [N]              last N records (default 10)
 *   schema DATASET                recorded schema DDL
 *   log DATASET                   metadata chain blocks, newest first
 *   ingest DATASET FILE [ISO8601] ingest a file through the polling source
 *   poll DATASET [ISO8601]        one fetch+ingest poll round
 *   pull DATASET [ISO8601]        recursive pull: poll roots, run transforms
 *                                 in dependency order (kamu pull --recursive)
 *   search QUERY                  case-insensitive substring search over
 *                                 dataset names/metadata (kamu search)
 *   search --rank QUERY           rank datasets by hashed-TF cosine between
 *                                 the query and name+description+schema
 *   lineage DATASET               upstream dependency tree
 *                                 (kamu inspect lineage, provenance_service.rs)
 *   inspect DATASET               declared transform: inputs + SQL steps
 *                                 (kamu inspect query)
 *   webhook add DATASET URL SECRET [TYPES]
 *                                 subscribe URL to DATASET.REF.UPDATED
 *                                 events (RFC 9421-signed deliveries);
 *                                 TYPES = comma list to also/instead get
 *                                 FLOW.RUN.FAILED and
 *                                 DATASET.VERIFICATION.FAILED pages
 *   webhook list | webhook rm DATASET URL
 *   flow set DATASET SCHEDULE     schedule updates: 'every 15m' or 5-field
 *                                 cron, UTC (flow system, schedules subset)
 *   flow set DATASET --reactive RULE|off
 *                                 event-driven trigger for a derivative:
 *                                 'immediate' or buffer:<minRecords>:<iv>
 *                                 (+':recover' to re-pull on upstream
 *                                 resets) — fires off upstream head moves,
 *                                 batching_rule.rs/reactive_rule.rs
 *   flow retry DATASET POLICY|off retry policy for failed pulls:
 *                                 <maxAttempts>:<delay>:<backoff>, e.g.
 *                                 3:30s:exponential (backoff one of fixed|
 *                                 linear|exponential|exponential-jitter —
 *                                 retry_policy.rs)
 *   flow pause|resume DATASET     suspend/restore a dataset's triggers
 *                                 without losing its config
 *   flow list                     scheduled datasets with last-run times,
 *                                 retry policies, and failing-attempt state
 *   flow rm DATASET               unschedule
 *   flow run [ISO8601]            run-due-now executor tick: pull exactly
 *                                 the datasets whose schedule, reactive
 *                                 rule, or pending backoff retry is due;
 *                                 failures retry per policy instead of
 *                                 aborting the tick
 *   repo add NAME URL             register a remote repository alias
 *   repo list                     registered remotes
 *   repo rm NAME                  remove a remote alias
 *   alias add DATASET REMOTE [--push|--pull]
 *                                 set a per-dataset default remote (both
 *                                 kinds when no flag) — push/status/pull
 *                                 --from then work without naming a remote
 *                                 (kamu repo alias, remote_aliases.rs)
 *   alias list | alias rm DATASET [REMOTE] [--push|--pull]
 *   new NAME [--derivative]       print a DatasetSnapshot manifest template
 *                                 (kamu new; pipe into a file, edit, `add`)
 *   completions bash              shell completion script (kamu completions)
 *   diagnose                      workspace health: per-dataset chain shape
 *                                 + full verification (kamu system diagnose)
 *   push DATASET REMOTE [--force] sync the dataset to REMOTE (alias, any
 *                                 FileSystem URI, a served node's http(s)
 *                                 URL — simple transfer protocol write
 *                                 side — or a multi-tenant ref
 *                                 repo[/account]/dataset, dataset_alias.rs)
 *                                 (kamu push, sync_service.rs)
 *   pull DATASET --from REMOTE [--force]
 *                                 sync the dataset from REMOTE into the
 *                                 workspace (created if absent); REMOTE may
 *                                 be an alias, a FileSystem URI, or a served
 *                                 node's http(s) URL (simple transfer
 *                                 protocol)
 *   status DATASET REMOTE         equal | ahead N | behind N | diverged
 *                                 (remote_status_service_impl.rs)
 *   export DATASET PATH [FORMAT]  write full history: parquet|csv|ndjson
 *                                 (kamu export, export_command.rs)
 *   serve [--rest-port N] [--jdbc-port N] [--flow-interval DUR]
 *                                 REST (+OData/GraphQL) and JDBC servers over
 *                                 the workspace until stdin closes or 'exit'
 *                                 (kamu system api-server); --flow-interval
 *                                 (e.g. 30s) co-runs the flow executor on a
 *                                 wall-clock tick, like the reference's
 *                                 embedded flow agent
 *   verify DATASET                integrity check (hashes + replay)
 *   compact DATASET [MAXRECORDS]  compact slices (atomic swap)
 *   reset DATASET BLOCKHASH       rewind head
 *   delete DATASET [--force]      remove a dataset (refuses while downstream
 *                                 transforms read it; drops its flow/webhook
 *                                 registrations) (kamu delete)
 *   rename DATASET NEWNAME [--force]
 *                                 rename the workspace alias; migrates
 *                                 flow/webhook registrations (kamu rename)
 *   set-watermark DATASET ISO8601 advance a root dataset's watermark without
 *                                 data (kamu system set-watermark)
 *   gc [DATASET]                  reclaim unreachable blocks, orphan slices/
 *                                 checkpoints, staging leftovers (kamu
 *                                 system gc)
 *   lineage DATASET --dot         dependency graph as Graphviz DOT
 *                                 (kamu system depgraph)
 *   decode DATASET BLOCKHASH      print one metadata block's JSON
 *                                 (kamu system decode)
 *   init [--exists-ok]            mark the directory as a workspace
 *                                 (kamu init, init_command.rs; implicit
 *                                 workspaces keep working without it)
 *   config list|get KEY|set KEY [VALUE]
 *                                 workspace-scoped config at
 *                                 .graft/config.json; set with no value
 *                                 unsets (kamu config, config_command.rs).
 *                                 Read by: compact.maxSliceRecords,
 *                                 serve.rest.port, serve.smart.port,
 *                                 serve.jdbc.port
 *   info                          engine/runtime/workspace summary
 *                                 (kamu system info)
 */
object Cli {

  def main(args: Array[String]): Unit = {
    val spark = SessionDefaults.tuned(SparkSession.builder())
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[*]"))
      .appName("graft-cli")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val code =
      try run(spark, args.toSeq, Console.in, System.out)
      finally spark.stop()
    sys.exit(code)
  }

  /** Testable entry: returns a process exit code, never calls sys.exit. */
  def run(spark: SparkSession, argv: Seq[String], in: BufferedReader, out: PrintStream): Int = {
    val (wsOpt, rest) = argv.indexOf("--workspace") match {
      case i if i >= 0 && i + 1 < argv.length =>
        (argv(i + 1), argv.patch(i, Nil, 2))
      case _ => (".", argv)
    }
    try {
      rest.toList match {
        case "list" :: Nil                 => cmdList(spark, wsOpt, out)
        case "sql" :: "-c" :: stmt :: Nil  => cmdSqlOnce(spark, wsOpt, stmt, out)
        case "sql" :: Nil                  => cmdSqlRepl(spark, wsOpt, in, out)
        case "tail" :: ds :: restN         => cmdTail(spark, wsOpt, ds, restN.headOption.map(_.toInt).getOrElse(10), out)
        case "schema" :: ds :: Nil         => cmdSchema(spark, wsOpt, ds, out)
        case "log" :: ds :: Nil            => cmdLog(spark, wsOpt, ds, out)
        case "ingest" :: ds :: file :: t   =>
          val st = isoOrNow(t.headOption)
          notifyingHeadMoves(spark, wsOpt, out, st)(cmdIngest(spark, wsOpt, ds, file, st, out))
        case "poll" :: ds :: t             =>
          val st = isoOrNow(t.headOption)
          notifyingHeadMoves(spark, wsOpt, out, st)(cmdPoll(spark, wsOpt, ds, st, out))
        case "pull" :: ds :: "--from" :: Nil => cmdPullRemote(spark, wsOpt, ds, None, force = false, out)
        case "pull" :: ds :: "--from" :: remote :: fl => cmdPullRemote(spark, wsOpt, ds, Some(remote), fl.contains("--force"), out)
        case "pull" :: ds :: t             =>
          val st = isoOrNow(t.headOption)
          notifyingHeadMoves(spark, wsOpt, out, st)(cmdPull(spark, wsOpt, ds, st, out))
        case "lineage" :: ds :: Nil        => cmdLineage(spark, wsOpt, ds, dot = false, out)
        case "lineage" :: ds :: "--dot" :: Nil => cmdLineage(spark, wsOpt, ds, dot = true, out)
        case "decode" :: ds :: hash :: Nil => cmdDecode(spark, wsOpt, ds, hash, out)
        case "inspect" :: ds :: Nil        => cmdInspect(spark, wsOpt, ds, out)
        case "search" :: q :: Nil          => cmdSearch(spark, wsOpt, q, out)
        case "search" :: "--rank" :: q :: Nil => cmdSearchRank(spark, wsOpt, q, out)
        case "webhook" :: "add" :: ds :: url :: secret :: Nil =>
          cmdWebhook(spark, wsOpt, r => { r.add(graft.adapter.Webhooks.Subscription(ds, url, secret)); s"subscribed $ds -> $url" }, out)
        case "webhook" :: "add" :: ds :: url :: secret :: types :: Nil =>
          val ts = types.split(",").map(_.trim).filter(_.nonEmpty).toSeq
          val unknown = ts.filterNot(graft.adapter.Webhooks.AllEventTypes.contains)
          if (unknown.nonEmpty) { out.println(
            s"error: unknown event type(s): ${unknown.mkString(", ")} (one of ${graft.adapter.Webhooks.AllEventTypes.mkString(", ")})"); 1 }
          else cmdWebhook(spark, wsOpt, r => {
            r.add(graft.adapter.Webhooks.Subscription(ds, url, secret, eventTypes = ts))
            s"subscribed $ds -> $url (${ts.mkString(",")})" }, out)
        case "webhook" :: "list" :: Nil =>
          cmdWebhook(spark, wsOpt, r => r.list().map(s => s"${s.dataset}\t${s.url}\t${s.eventTypes.mkString(",")}").mkString("\n"), out)
        case "webhook" :: "rm" :: ds :: url :: Nil =>
          cmdWebhook(spark, wsOpt, r => { r.remove(ds, url); s"unsubscribed $ds -> $url" }, out)
        case "flow" :: "set" :: ds :: "--reactive" :: "off" :: Nil =>
          cmdFlowReactive(spark, wsOpt, ds, None, out)
        case "flow" :: "set" :: ds :: "--reactive" :: rule :: Nil =>
          cmdFlowReactive(spark, wsOpt, ds, Some(rule), out)
        case "flow" :: "set" :: ds :: sched if sched.nonEmpty =>
          cmdFlowSet(spark, wsOpt, ds, sched.mkString(" "), out)
        case "flow" :: "retry" :: ds :: "off" :: Nil =>
          cmdFlowRetry(spark, wsOpt, ds, None, out)
        case "flow" :: "retry" :: ds :: policy :: Nil =>
          cmdFlowRetry(spark, wsOpt, ds, Some(policy), out)
        case "flow" :: "pause" :: ds :: Nil  => cmdFlowPause(spark, wsOpt, ds, pause = true, out)
        case "flow" :: "resume" :: ds :: Nil => cmdFlowPause(spark, wsOpt, ds, pause = false, out)
        case "flow" :: "list" :: Nil       => cmdFlowList(spark, wsOpt, out)
        case "flow" :: "rm" :: ds :: Nil   => cmdFlowRm(spark, wsOpt, ds, out)
        case "flow" :: "run" :: t          =>
          val st = isoOrNow(t.headOption)
          notifyingHeadMoves(spark, wsOpt, out, st)(cmdFlowRun(spark, wsOpt, st, out))
        case "repo" :: "add" :: n :: u :: Nil => cmdRepo(spark, wsOpt, r => { r.add(n, u); s"added $n -> $u" }, out)
        case "repo" :: "list" :: Nil       => cmdRepo(spark, wsOpt, r => r.list().toSeq.sorted.map { case (n, u) => s"$n $u" }.mkString("\n"), out)
        case "repo" :: "rm" :: n :: Nil    => cmdRepo(spark, wsOpt, r => { r.remove(n); s"removed $n" }, out)
        case "alias" :: "add" :: ds :: remote :: fl =>
          val kinds = Seq("push", "pull").filter(k => fl.contains(s"--$k")) match {
            case Seq() => Seq("push", "pull") // no flag = both, like the reference
            case ks    => ks
          }
          cmdRepo(spark, wsOpt, r => {
            kinds.foreach(r.aliasAdd(ds, _, remote)); s"aliased $ds -> $remote (${kinds.mkString(",")})"
          }, out)
        case "alias" :: "list" :: Nil =>
          cmdRepo(spark, wsOpt,
            r => r.aliases().map(a => s"${a.dataset}\t${a.kind}\t${a.remote}").mkString("\n"), out)
        case "alias" :: "rm" :: ds :: fl =>
          val kind = Seq("push", "pull").find(k => fl.contains(s"--$k"))
          val remote = fl.filterNot(_.startsWith("--")).headOption
          cmdRepo(spark, wsOpt, r => { r.aliasRemove(ds, kind, remote); s"unaliased $ds" }, out)
        case "push" :: ds :: Nil           => cmdPush(spark, wsOpt, ds, None, force = false, out)
        case "push" :: ds :: "--force" :: Nil => cmdPush(spark, wsOpt, ds, None, force = true, out)
        case "push" :: ds :: remote :: fl  => cmdPush(spark, wsOpt, ds, Some(remote), fl.contains("--force"), out)
        case "status" :: ds :: restR if restR.size <= 1 => cmdStatus(spark, wsOpt, ds, restR.headOption, out)
        case "add" :: file :: t            => cmdAdd(spark, wsOpt, file, isoOrNow(t.headOption), out)
        case "export" :: ds :: path :: f   => cmdExport(spark, wsOpt, ds, path, f.headOption.getOrElse("parquet"), out)
        case "serve" :: rest2              => cmdServe(spark, wsOpt, rest2, in, out)
        case "verify" :: ds :: Nil         => cmdVerify(spark, wsOpt, ds, out)
        case "delete" :: ds :: fl          => cmdDelete(spark, wsOpt, ds, fl.contains("--force"), out)
        case "rename" :: ds :: nw :: fl    => cmdRename(spark, wsOpt, ds, nw, fl.contains("--force"), out)
        case "set-watermark" :: ds :: iso :: Nil => cmdSetWatermark(spark, wsOpt, ds, iso, out)
        case "gc" :: rest2                 => cmdGc(spark, wsOpt, rest2.headOption, out)
        case "new" :: name :: fl           => cmdNew(name, fl.contains("--derivative"), out)
        case "init" :: fl                  => cmdInit(spark, wsOpt, fl.contains("--exists-ok"), out)
        case "config" :: "list" :: Nil =>
          cmdConfig(spark, wsOpt, c =>
            c.list().toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString("\n"), out)
        case "config" :: "get" :: k :: Nil =>
          cmdConfig(spark, wsOpt, c => c.get(k).getOrElse(s"(unset) $k"), out)
        case "config" :: "set" :: k :: v :: Nil =>
          cmdConfig(spark, wsOpt, c => { c.set(k, v); s"set $k=$v" }, out)
        case "config" :: "set" :: k :: Nil => // no value = unset, like the reference
          cmdConfig(spark, wsOpt, c => { c.unset(k); s"unset $k" }, out)
        case "info" :: Nil                 => cmdInfo(spark, wsOpt, out)
        case "completions" :: shell :: Nil => cmdCompletions(shell, out)
        case "diagnose" :: Nil             => cmdDiagnose(spark, wsOpt, out)
        case "compact" :: ds :: restN      => cmdCompact(spark, wsOpt, ds, restN.headOption.map(_.toLong), out)
        case "reset" :: ds :: hash :: Nil  => cmdReset(spark, wsOpt, ds, hash, out)
        case other =>
          out.println(s"error: unknown command '${other.mkString(" ")}' (see Cli scaladoc)")
          2
      }
    } catch {
      case e: Exception =>
        out.println(s"error: ${e.getMessage}")
        1
    }
  }

  private def isoOrNow(iso: Option[String]): Long =
    iso.map(java.time.Instant.parse(_).toEpochMilli).getOrElse(System.currentTimeMillis())

  private def workspaceDatasets(spark: SparkSession, ws: String): Map[String, Dataset] = {
    val root = new org.apache.hadoop.fs.Path(ws)
    val hconf = spark.sparkContext.hadoopConfiguration
    val fs = root.getFileSystem(hconf)
    if (!fs.exists(root)) Map.empty
    else
      fs.listStatus(root)
        .filter(_.isDirectory)
        .map(_.getPath)
        .filter(p => MetadataChain.exists(p, hconf))
        .map(p => p.getName -> Dataset.open(spark, p.toString))
        .toMap
  }

  private def open(spark: SparkSession, ws: String, name: String): Dataset =
    workspaceDatasets(spark, ws).getOrElse(
      name, throw new IllegalArgumentException(s"no dataset '$name' in workspace $ws"))

  private def printCsv(df: DataFrame, out: PrintStream): Unit =
    out.print(Export.csvString(df))

  private def cmdList(spark: SparkSession, ws: String, out: PrintStream): Int = {
    workspaceDatasets(spark, ws).keys.toSeq.sorted.foreach(out.println)
    0
  }

  private def cmdSqlOnce(spark: SparkSession, ws: String, stmt: String, out: PrintStream): Int = {
    val qs = new QueryService(spark, workspaceDatasets(spark, ws))
    printCsv(qs.sql(stmt), out)
    0
  }

  /** REPL: one statement per line; a failed statement reports and continues
    * (sql_shell_command.rs keeps the session alive on error the same way). */
  private def cmdSqlRepl(spark: SparkSession, ws: String, in: BufferedReader, out: PrintStream): Int = {
    val qs = new QueryService(spark, workspaceDatasets(spark, ws))
    Iterator
      .continually(in.readLine())
      .takeWhile(l => l != null && l.trim != "exit" && l.trim != "quit")
      .map(_.trim)
      .filter(_.nonEmpty)
      .foreach { stmt =>
        try printCsv(qs.sql(stmt), out)
        catch { case e: Exception => out.println(s"error: ${e.getMessage}") }
      }
    0
  }

  private def cmdTail(spark: SparkSession, ws: String, ds: String, n: Int, out: PrintStream): Int = {
    printCsv(open(spark, ws, ds).tail(n), out)
    0
  }

  private def cmdSchema(spark: SparkSession, ws: String, ds: String, out: PrintStream): Int = {
    open(spark, ws, ds).chain.schemaDdl() match {
      case Some(ddl) => out.println(ddl); 0
      case None      => out.println("(no schema recorded)"); 1
    }
  }

  private def cmdLog(spark: SparkSession, ws: String, ds: String, out: PrintStream): Int = {
    open(spark, ws, ds).chain.blocksWithHashes().reverse.foreach { case (b, h) =>
      out.println(s"$h seq=${b.sequenceNumber} ${b.event.getClass.getSimpleName}")
    }
    0
  }

  private def cmdIngest(spark: SparkSession, ws: String, ds: String, file: String,
      systemTime: Long, out: PrintStream): Int = {
    IngestWriter.ingestFile(open(spark, ws, ds), file, systemTime) match {
      case Some(add) => out.println(s"committed offsets ${add.offsetStart}..${add.offsetEnd}"); 0
      case None      => out.println("up to date"); 0
    }
  }

  private def cmdPoll(spark: SparkSession, ws: String, ds: String,
      systemTime: Long, out: PrintStream): Int = {
    IngestWriter.pollOnce(open(spark, ws, ds), systemTime) match {
      case Some(add) => out.println(s"committed offsets ${add.offsetStart}..${add.offsetEnd}"); 0
      case None      => out.println("up to date"); 0
    }
  }

  private def cmdPull(spark: SparkSession, ws: String, ds: String,
      systemTime: Long, out: PrintStream): Int = {
    import graft.transform.TransformService
    val datasets = workspaceDatasets(spark, ws)
    def lookup(name: String): Dataset = datasets.getOrElse(
      name, throw new IllegalArgumentException(s"no dataset '$name' in workspace $ws"))
    val target = lookup(ds)
    val resolve = (name: String) => lookup(name)
    TransformService.pullRecursive(target, resolve, systemTime).foreach {
      case (name, TransformService.RootUpdated(add)) =>
        out.println(s"$name: committed offsets ${add.offsetStart}..${add.offsetEnd}")
      case (name, TransformService.RootUpToDate) =>
        out.println(s"$name: up to date")
      case (name, TransformService.Derived(TransformService.Updated(ev))) =>
        val range = ev.newData.map(d => s"${d.offsetStart}..${d.offsetEnd}").getOrElse("none")
        out.println(s"$name: transformed, offsets $range")
      case (name, TransformService.Derived(TransformService.UpToDate)) =>
        out.println(s"$name: up to date")
    }
    0
  }

  private def cmdSearch(spark: SparkSession, ws: String, q: String, out: PrintStream): Int = {
    val hits = graft.query.Search.search(workspaceDatasets(spark, ws), q)
    hits.foreach(h => out.println(s"${h.dataset}\t${h.field}\t${h.snippet}"))
    if (hits.isEmpty) { out.println("(no matches)"); 1 } else 0
  }

  private def cmdInspect(spark: SparkSession, ws: String, ds: String, out: PrintStream): Int = {
    val d = open(spark, ws, ds)
    d.chain.transform() match {
      case None =>
        out.println(s"${d.name} (${d.kind}): no transform declared")
        d.chain.pollingSource().foreach { src =>
          out.println(s"polling source: format=${src.readFormat} merge=${src.merge.kind}" +
            (if (src.merge.primaryKey.nonEmpty) s" pk=${src.merge.primaryKey.mkString(",")}" else ""))
        }
        0
      case Some(t) =>
        out.println(s"${d.name} (${d.kind})")
        out.println(s"inputs: ${t.inputs.mkString(", ")}")
        t.steps.foreach { st =>
          st.alias.foreach(a => out.println(s"-- $a:"))
          out.println(st.query)
        }
        0
    }
  }

  private def cmdSearchRank(spark: SparkSession, ws: String, q: String, out: PrintStream): Int = {
    val hits = graft.query.Search.rank(workspaceDatasets(spark, ws), q)
    hits.foreach(h => out.println(f"${h.dataset}\t${h.score}%.4f"))
    if (hits.isEmpty) { out.println("(no matches)"); 1 } else 0
  }

  private def cmdLineage(spark: SparkSession, ws: String, ds: String, dot: Boolean,
      out: PrintStream): Int = {
    val datasets = workspaceDatasets(spark, ws)
    val target = datasets.getOrElse(
      ds, throw new IllegalArgumentException(s"no dataset '$ds' in workspace $ws"))
    val resolve = (n: String) => datasets.getOrElse(
      n, throw new IllegalArgumentException(s"lineage input '$n' not in workspace $ws"))
    out.print(
      if (dot) graft.transform.Lineage.toDot(target, resolve)
      else graft.transform.Lineage.render(target, resolve))
    0
  }

  /** Print one metadata block's JSON by hash (kamu system decode,
    * system_decode_command.rs). */
  private def cmdDecode(spark: SparkSession, ws: String, ds: String, hash: String,
      out: PrintStream): Int = {
    val chain = open(spark, ws, ds).chain
    chain.blocksWithHashes().find(_._2 == hash) match {
      case Some((block, _)) =>
        out.println(org.json4s.jackson.Serialization.writePretty(block)(MetadataChain.formats))
        0
      case None =>
        out.println(s"error: block $hash not found in ${ds}'s chain")
        1
    }
  }

  // ----------------------------------------------------------- webhooks

  private def webhookRegistry(spark: SparkSession, ws: String) =
    new graft.adapter.Webhooks.Registry(
      new org.apache.hadoop.fs.Path(ws), spark.sparkContext.hadoopConfiguration)

  private def cmdWebhook(spark: SparkSession, ws: String,
      f: graft.adapter.Webhooks.Registry => String, out: PrintStream): Int = {
    val msg = f(webhookRegistry(spark, ws))
    if (msg.nonEmpty) out.println(msg)
    0
  }

  /** Run `body`, then fire DATASET.REF.UPDATED for every workspace dataset
    * whose head moved — dead subscribers report, never fail the command. */
  private def notifyingHeadMoves[T](spark: SparkSession, ws: String, out: PrintStream,
      systemTime: Long)(body: => T): T = {
    val reg = webhookRegistry(spark, ws)
    val subscribed = reg.list().map(_.dataset).toSet
    def heads(): Map[String, Option[String]] =
      workspaceDatasets(spark, ws).collect {
        case (n, d) if subscribed.contains(n) => n -> d.chain.head.map(_._2)
      }
    val before = heads()
    val result = body
    if (subscribed.nonEmpty) heads().foreach { case (name, newHead) =>
      val oldHead = before.getOrElse(name, None)
      if (newHead.isDefined && newHead != oldHead)
        graft.adapter.Webhooks
          .notifyRefUpdated(reg, name, newHead.get, oldHead, systemTime)
          .foreach { d =>
            if (d.error.isDefined)
              out.println(s"webhook ${d.subscription.url}: ${d.error.get} (queued for retry)")
          }
    }
    // every command tick also drains due redeliveries from earlier failures
    graft.adapter.Webhooks.redeliverDue(reg, systemTime).foreach { d =>
      if (d.error.isDefined)
        out.println(s"webhook retry ${d.subscription.url}: ${d.error.get}")
      else out.println(s"webhook retry ${d.subscription.url}: delivered")
    }
    result
  }

  // ------------------------------------------------------------- flows

  private def flowRegistry(spark: SparkSession, ws: String) =
    new graft.flow.FlowService.Registry(
      new org.apache.hadoop.fs.Path(ws), spark.sparkContext.hadoopConfiguration)

  private def cmdFlowSet(spark: SparkSession, ws: String, ds: String, sched: String,
      out: PrintStream): Int = {
    open(spark, ws, ds) // validate the dataset exists
    val parsed = graft.flow.FlowService.parseSchedule(sched)
    flowRegistry(spark, ws).set(ds, parsed)
    out.println(s"scheduled $ds: ${parsed.render}")
    0
  }

  private def cmdFlowReactive(spark: SparkSession, ws: String, ds: String,
      rule: Option[String], out: PrintStream): Int = {
    open(spark, ws, ds) // validate the dataset exists
    val reg = flowRegistry(spark, ws)
    rule match {
      case Some(r) =>
        val parsed = graft.flow.FlowService.parseReactiveRule(r)
        reg.setReactiveRule(ds, parsed)
        out.println(s"reactive $ds: ${parsed.render}")
      case None =>
        reg.removeReactiveRule(ds)
        out.println(s"reactive $ds: off")
    }
    0
  }

  private def cmdFlowRetry(spark: SparkSession, ws: String, ds: String,
      policy: Option[String], out: PrintStream): Int = {
    open(spark, ws, ds) // validate the dataset exists
    val reg = flowRegistry(spark, ws)
    policy match {
      case Some(p) =>
        val parsed = graft.flow.FlowService.parseRetryPolicy(p)
        reg.setRetryPolicy(ds, parsed)
        out.println(s"retry policy $ds: ${parsed.render}")
      case None =>
        reg.removeRetryPolicy(ds)
        out.println(s"retry policy $ds: off")
    }
    0
  }

  private def cmdFlowPause(spark: SparkSession, ws: String, ds: String, pause: Boolean,
      out: PrintStream): Int = {
    open(spark, ws, ds) // validate the dataset exists
    val reg = flowRegistry(spark, ws)
    if (pause) { reg.pause(ds); out.println(s"paused $ds") }
    else { reg.resume(ds); out.println(s"resumed $ds") }
    0
  }

  private def cmdFlowList(spark: SparkSession, ws: String, out: PrintStream): Int = {
    val reg = flowRegistry(spark, ws)
    val last = reg.lastRuns()
    val policies = reg.retryPolicies()
    val attempts = reg.attemptStates()
    val schedules = reg.schedules()
    val reactives = reg.reactiveRules()
    val pausedSet = reg.paused()
    (schedules.keySet ++ reactives.keySet).toSeq.sorted.foreach { ds =>
      val trigger = (schedules.get(ds).map(_.render).toSeq ++
        reactives.get(ds).map(r => s"reactive=${r.render}").toSeq ++
        (if (pausedSet.contains(ds)) Seq("PAUSED") else Nil)).mkString(" ")
      val lr = last.get(ds)
        .map(t => java.time.Instant.ofEpochMilli(t).toString)
        .getOrElse("never")
      val retry = policies.get(ds).map(p => s"\tretry=${p.render}").getOrElse("")
      val failing = attempts.get(ds).map(a =>
        s"\tfailing=${a.failedAttempts} since ${java.time.Instant.ofEpochMilli(a.lastAttemptAt)}"
      ).getOrElse("")
      out.println(s"$ds\t$trigger\tlast-run=$lr$retry$failing")
    }
    0
  }

  private def cmdFlowRm(spark: SparkSession, ws: String, ds: String, out: PrintStream): Int = {
    flowRegistry(spark, ws).remove(ds)
    out.println(s"unscheduled $ds")
    0
  }

  private def cmdFlowRun(spark: SparkSession, ws: String, now: Long, out: PrintStream): Int = {
    val datasets = workspaceDatasets(spark, ws)
    val resolve = (n: String) => datasets.getOrElse(
      n, throw new IllegalArgumentException(s"no dataset '$n' in workspace $ws"))
    var failures = 0
    val wreg = webhookRegistry(spark, ws)
    graft.flow.FlowService.runDue(spark, flowRegistry(spark, ws), resolve, now).foreach {
      case (name, status) =>
        status match {
          case graft.flow.FlowService.Failed(attempts, err) =>
            failures += 1
            // retries exhausted (or none configured): page subscribers
            graft.adapter.Webhooks.notifyEvent(
              wreg, name, graft.adapter.Webhooks.EventFlowFailed,
              graft.adapter.Webhooks.flowFailedPayload(name, attempts, err), now)
          case _ => ()
        }
        out.println(s"$name: ${status.render}")
    }
    if (failures > 0) 1 else 0
  }

  // ------------------------------------------------------- remote sync

  private def hconf(spark: SparkSession) = spark.sparkContext.hadoopConfiguration

  private def registry(spark: SparkSession, ws: String) =
    new graft.sync.RemoteRegistry(new org.apache.hadoop.fs.Path(ws), hconf(spark))

  private def cmdRepo(spark: SparkSession, ws: String,
      f: graft.sync.RemoteRegistry => String, out: PrintStream): Int = {
    val msg = f(registry(spark, ws))
    if (msg.nonEmpty) out.println(msg)
    0
  }

  /** Resolve a remote ref (alias, URL, or multi-tenant
    * `repo[/account]/dataset`) to (base, remote dataset path) — the dataset's
    * root inside a repository is `<base>/<remotePath>`, same layout a
    * workspace uses, with an account as one extra directory level. */
  private def resolveRemoteRef(spark: SparkSession, ws: String, ds: String, remote: String) =
    registry(spark, ws).resolveRef(remote, ds)

  private def printSync(r: graft.sync.SyncService.SyncResult, out: PrintStream): Int = r match {
    case graft.sync.SyncService.UpToDate => out.println("up to date"); 0
    case graft.sync.SyncService.Updated(_, newHead, n, files) =>
      out.println(s"synced $n block(s), $files data file(s), head $newHead"); 0
  }

  private def cmdPush(spark: SparkSession, ws: String, ds: String, remote: Option[String],
      force: Boolean, out: PrintStream): Int = {
    val local = open(spark, ws, ds) // validates existence
    val reg = registry(spark, ws)
    val named = remote.getOrElse(reg.aliasResolve(ds, "push"))
    val (resolved, remotePath) = resolveRemoteRef(spark, ws, ds, named)
    val result =
      if (isWs(resolved)) // served node: smart-transfer-protocol push (WS)
        graft.sync.SmartSync.push(resolved, remotePath, local.chain.root, hconf(spark), force = force)
      else if (isHttp(resolved)) // served node: simple-transfer-protocol push
        graft.sync.HttpSync.push(resolved, remotePath, local.chain.root, hconf(spark), force = force)
      else graft.sync.SyncService.sync(
        local.chain.root, new org.apache.hadoop.fs.Path(resolved, remotePath),
        hconf(spark), force = force)
    printSync(result, out)
  }

  private def isHttp(url: String): Boolean =
    url.startsWith("http://") || url.startsWith("https://")

  private def isWs(url: String): Boolean =
    url.startsWith("ws://") || url.startsWith("wss://")

  private def cmdPullRemote(spark: SparkSession, ws: String, ds: String, remote: Option[String],
      force: Boolean, out: PrintStream): Int = {
    val reg = registry(spark, ws)
    val named = remote.getOrElse(reg.aliasResolve(ds, "pull"))
    val (resolved, remotePath) = resolveRemoteRef(spark, ws, ds, named)
    val localRoot = new org.apache.hadoop.fs.Path(ws, ds)
    val result =
      if (isWs(resolved)) // served node: smart-transfer-protocol client (WS)
        graft.sync.SmartSync.pull(resolved, remotePath, localRoot, hconf(spark), force = force)
      else if (isHttp(resolved)) // served node: simple-transfer-protocol client
        graft.sync.HttpSync.pull(resolved, remotePath, localRoot, hconf(spark), force = force)
      else graft.sync.SyncService.sync(
        new org.apache.hadoop.fs.Path(resolved, remotePath), localRoot,
        hconf(spark), force = force)
    printSync(result, out)
  }

  private def cmdStatus(spark: SparkSession, ws: String, ds: String, remote: Option[String],
      out: PrintStream): Int = {
    import graft.sync.SyncService
    val local = open(spark, ws, ds)
    val reg = registry(spark, ws)
    // no remote argument: prefer the push alias, else the pull alias
    val named = remote.getOrElse {
      try reg.aliasResolve(ds, "push")
      catch { case _: IllegalArgumentException => reg.aliasResolve(ds, "pull") }
    }
    val (resolved, remotePath) = resolveRemoteRef(spark, ws, ds, named)
    val status =
      if (isWs(resolved)) {
        graft.sync.SmartSync.status(resolved, remotePath, local.chain.root, hconf(spark))
      } else if (isHttp(resolved)) {
        graft.sync.HttpSync.status(resolved, remotePath, local.chain.root, hconf(spark))
      } else {
        val remoteRoot = new org.apache.hadoop.fs.Path(resolved, remotePath)
        if (!MetadataChain.exists(remoteRoot, hconf(spark))) {
          out.println("remote: absent"); return 0
        }
        SyncService.compare(local.chain, MetadataChain.open(remoteRoot, hconf(spark)))
      }
    status match {
      case SyncService.Equal       => out.println("equal"); 0
      case SyncService.Ahead(b)    => out.println(s"ahead ${b.size}"); 0
      case SyncService.Behind(n)   => out.println(s"behind $n"); 0
      case SyncService.Diverged(s2, d) => out.println(s"diverged +$s2/-$d"); 1
    }
  }

  private def cmdAdd(spark: SparkSession, ws: String, file: String,
      systemTime: Long, out: PrintStream): Int = {
    val snap = graft.dataset.DatasetSnapshot.parse(
      java.nio.file.Files.readString(java.nio.file.Paths.get(file)))
    val ds = graft.dataset.DatasetSnapshot.add(spark, ws, snap, systemTime)
    out.println(s"added ${ds.name} (${ds.kind}), ${snap.metadata.size + 1} blocks")
    0
  }

  private def cmdExport(spark: SparkSession, ws: String, ds: String, path: String,
      format: String, out: PrintStream): Int = {
    val df = open(spark, ws, ds).toDF()
    format match {
      case "parquet" => Export.toParquet(df, path)
      case "csv"     => Export.toCsv(df, path)
      case "ndjson"  => Export.toNdjson(df, path)
      case other =>
        out.println(s"error: unknown export format '$other' (parquet|csv|ndjson)")
        return 2
    }
    out.println(s"exported ${df.count()} records to $path")
    0
  }

  private def cmdServe(spark: SparkSession, ws: String, args: List[String],
      in: BufferedReader, out: PrintStream): Int = {
    // explicit flag > workspace config > ephemeral port
    val cfg = workspaceConfig(spark, ws)
    def portArg(flag: String): Option[Int] = (args.indexOf(flag) match {
      case i if i >= 0 && i + 1 < args.length => Some(args(i + 1).toInt)
      case _                                  => None
    }).orElse(cfg.getInt(s"serve.${flag.stripPrefix("--").stripSuffix("-port")}.port"))
    val datasets = workspaceDatasets(spark, ws)
    // An accepted HTTP push moves a served head — same webhook obligation as
    // a local ingest/pull head move.
    val onHeadMove: (String, String) => Unit = { (name, newHead) =>
      val reg = webhookRegistry(spark, ws)
      graft.adapter.Webhooks
        .notifyRefUpdated(reg, name, newHead, None, System.currentTimeMillis())
        .foreach { d =>
          if (d.error.isDefined) out.println(s"webhook ${d.subscription.url}: ${d.error.get}")
        }
    }
    val rest = new graft.adapter.RestServer(
      new QueryService(spark, datasets), datasets, portArg("--rest-port").getOrElse(0),
      workspaceRoot = Some(ws), onHeadMove = onHeadMove).start()
    // From here on the REST server is live: everything else (including JDBC
    // startup, which can throw on a bound port or a bad --jdbc-port value)
    // runs inside try/finally so an embedded caller never leaks it.
    var stopJdbc: Option[() => Unit] = None
    var smart: Option[graft.sync.SmartTransferServer] = None
    val flowAgentStop = new java.util.concurrent.atomic.AtomicBoolean(false)
    var flowAgent: Option[Thread] = None
    try {
      out.println(s"rest: http://127.0.0.1:${rest.boundPort}")
      smart = Some(new graft.sync.SmartTransferServer(
        rest, portArg("--smart-port").getOrElse(0)).start())
      out.println(s"smart: ws://127.0.0.1:${smart.get.boundPort}")
      stopJdbc = portArg("--jdbc-port").map { p =>
        val stop = graft.adapter.JdbcServer.start(
          spark, new org.apache.hadoop.fs.Path(ws).toUri.toString, p)
        out.println(s"jdbc: jdbc:hive2://localhost:$p/")
        stop
      }
      // Embedded flow agent (the reference's api-server runs its flow
      // system the same way): tick the run-due-now executor on a wall-clock
      // interval while the node serves. Off unless --flow-interval (or the
      // serve.flow.interval workspace config) is set — batch workflows
      // drive ticks explicitly with `flow run` and a controlled clock.
      val flowIntervalMs: Option[Long] = ((args.indexOf("--flow-interval") match {
        case i if i >= 0 && i + 1 < args.length => Some(args(i + 1))
        case _                                  => None
      }).orElse(cfg.get("serve.flow.interval"))).map { d =>
        val m = "^(\\d+)\\s*(ms|s|m|h)$".r
        d.trim match {
          case m(n, "ms") => n.toLong
          case m(n, "s")  => n.toLong * 1000L
          case m(n, "m")  => n.toLong * 60000L
          case m(n, "h")  => n.toLong * 3600000L
          case other => throw new IllegalArgumentException(s"bad flow interval '$other'")
        }
      }
      flowIntervalMs.foreach { iv =>
        out.println(s"flow agent: tick every ${iv}ms")
        val agent = new Thread(() => {
          while (!flowAgentStop.get()) {
            try {
              // re-list each tick: pushes can create datasets while serving
              val ds = workspaceDatasets(spark, ws)
              val resolve = (n: String) => ds.getOrElse(n,
                throw new IllegalArgumentException(s"no dataset '$n' in workspace $ws"))
              val now = System.currentTimeMillis()
              notifyingHeadMoves(spark, ws, out, now) {
                graft.flow.FlowService.runDue(spark, flowRegistry(spark, ws), resolve, now)
                  .foreach {
                    case (_, graft.flow.FlowService.NotDue) => ()
                    case (_, graft.flow.FlowService.Paused) => ()
                    case (n, st) => out.println(s"flow $n: ${st.render}")
                  }
              }
            } catch {
              case scala.util.control.NonFatal(e) =>
                out.println(s"flow agent error: ${Option(e.getMessage).getOrElse(e)}")
            }
            var waited = 0L
            while (waited < iv && !flowAgentStop.get()) {
              val step = math.min(50L, iv); Thread.sleep(step); waited += step
            }
          }
        }, "graft-flow-agent")
        agent.setDaemon(true)
        agent.start()
        flowAgent = Some(agent)
      }
      // block until stdin closes or an 'exit' line — the testable analog of
      // the reference's run-until-SIGINT api-server loop
      Iterator.continually(in.readLine())
        .takeWhile(l => l != null && l.trim != "exit")
        .foreach(_ => ())
      0
    } finally {
      flowAgentStop.set(true)
      flowAgent.foreach(_.join(3000))
      smart.foreach(_.stop())
      rest.stop()
      stopJdbc.foreach(_.apply())
    }
  }

  /** Workspace datasets whose declared transform reads `name` — the
    * dependents a delete/rename would break (delete_command.rs walks the
    * same dependency graph before deleting). */
  private def dependents(spark: SparkSession, ws: String, name: String): Seq[String] =
    workspaceDatasets(spark, ws).collect {
      case (n, d) if n != name && d.chain.transform().exists(_.inputs.contains(name)) => n
    }.toSeq.sorted

  /** Delete a dataset from the workspace (delete_command.rs): refuses while
    * downstream transforms declare it as an input unless `--force`; also
    * drops its flow schedule and webhook subscriptions. */
  private def cmdDelete(spark: SparkSession, ws: String, ds: String,
      force: Boolean, out: PrintStream): Int = {
    val target = open(spark, ws, ds) // validates existence
    val deps = dependents(spark, ws, ds)
    if (deps.nonEmpty && !force) {
      out.println(s"error: ${deps.mkString(", ")} depend(s) on $ds; use --force")
      return 1
    }
    flowRegistry(spark, ws).remove(ds)
    val wreg = webhookRegistry(spark, ws)
    wreg.list().filter(_.dataset == ds).foreach(s => wreg.remove(ds, s.url))
    registry(spark, ws).aliasRemove(ds, kind = None, remote = None)
    target.chain.fs.delete(target.chain.root, true)
    out.println(s"deleted $ds")
    0
  }

  /** Rename a dataset's workspace alias (rename_command.rs). The Seed block
    * is immutable history (the reference's dataset ID likewise survives a
    * rename — alias and identity are separate); what changes is the
    * directory name every workspace lookup keys on, plus the flow schedule
    * and webhook subscriptions registered under the alias. Downstream
    * transforms reference inputs BY NAME here, so rename refuses while
    * dependents exist unless `--force` (the reference's ID-based inputs
    * survive renames; ours would dangle). */
  private def cmdRename(spark: SparkSession, ws: String, ds: String, newName: String,
      force: Boolean, out: PrintStream): Int = {
    val target = open(spark, ws, ds)
    if (workspaceDatasets(spark, ws).contains(newName)) {
      out.println(s"error: dataset '$newName' already exists")
      return 1
    }
    val deps = dependents(spark, ws, ds)
    if (deps.nonEmpty && !force) {
      out.println(s"error: ${deps.mkString(", ")} read(s) from $ds by name; use --force")
      return 1
    }
    val fs = target.chain.fs
    val dest = new org.apache.hadoop.fs.Path(target.chain.root.getParent, newName)
    require(fs.rename(target.chain.root, dest), s"rename ${target.chain.root} -> $dest failed")
    // migrate alias-keyed registrations
    val freg = flowRegistry(spark, ws)
    freg.schedules().get(ds).foreach { sched => freg.set(newName, sched); freg.remove(ds) }
    val wreg = webhookRegistry(spark, ws)
    wreg.list().filter(_.dataset == ds).foreach { s =>
      wreg.remove(ds, s.url)
      wreg.add(s.copy(dataset = newName))
    }
    val rreg = registry(spark, ws)
    rreg.aliases().filter(_.dataset == ds).foreach { a =>
      rreg.aliasRemove(ds, Some(a.kind), Some(a.remote))
      rreg.aliasAdd(newName, a.kind, a.remote)
    }
    out.println(s"renamed $ds -> $newName")
    0
  }

  /** Advance a root dataset's watermark without data
    * (set_watermark_command.rs). */
  private def cmdSetWatermark(spark: SparkSession, ws: String, ds: String, iso: String,
      out: PrintStream): Int = {
    val target = open(spark, ws, ds)
    val wm = java.time.Instant.parse(iso).toEpochMilli
    Maintenance.setWatermark(target, wm, System.currentTimeMillis())
    out.println(s"watermark set to $iso")
    0
  }

  /** Every top-level subcommand, for help/completions. */
  private[graft] val Subcommands: Seq[String] = Seq(
    "add", "alias", "compact", "completions", "config", "decode", "delete",
    "diagnose", "export", "flow", "gc", "info", "ingest", "init", "inspect",
    "lineage", "list", "log", "new", "poll", "pull", "push", "rename", "repo",
    "reset", "schema", "search", "serve", "set-watermark", "sql", "status",
    "tail", "verify", "webhook")

  /** Workspace health report (kamu system diagnose,
    * system_diagnose_command.rs): per dataset — chain shape, head,
    * watermark, full integrity verification; exit 1 when any check fails. */
  private def workspaceConfig(spark: SparkSession, ws: String): WorkspaceConfig =
    new WorkspaceConfig(new org.apache.hadoop.fs.Path(ws),
      spark.sparkContext.hadoopConfiguration)

  /** `init` — mark a directory as a workspace (reference: init_command.rs).
    * Creates `.graft/` with an empty config. Unlike the reference, every
    * other command also works on an un-inited directory (implicit
    * workspaces) — init exists for explicitness and tooling, not as a
    * gate. */
  private def cmdInit(spark: SparkSession, ws: String, existsOk: Boolean,
      out: PrintStream): Int = {
    val marker = new org.apache.hadoop.fs.Path(ws, ".graft")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(marker)) {
      out.println(s"workspace already initialized at $ws")
      if (existsOk) 0 else 1
    } else {
      val cfg = workspaceConfig(spark, ws)
      cfg.set("workspace.version", "1")
      out.println(s"initialized workspace at $ws")
      0
    }
  }

  private def cmdConfig(spark: SparkSession, ws: String,
      f: WorkspaceConfig => String, out: PrintStream): Int = {
    out.println(f(workspaceConfig(spark, ws)))
    0
  }

  /** `info` — version/runtime/workspace summary (reference:
    * system_info_command.rs). */
  private def cmdInfo(spark: SparkSession, ws: String, out: PrintStream): Int = {
    val v = Option(getClass.getPackage.getImplementationVersion).getOrElse("dev")
    val ds = workspaceDatasets(spark, ws)
    out.println(s"graft $v")
    out.println(s"spark ${spark.version}")
    out.println(s"scala ${scala.util.Properties.versionNumberString}")
    out.println(s"java ${System.getProperty("java.version")}")
    out.println(s"workspace $ws (${ds.size} datasets)")
    0
  }

  private def cmdDiagnose(spark: SparkSession, ws: String, out: PrintStream): Int = {
    val datasets = workspaceDatasets(spark, ws).toSeq.sortBy(_._1)
    if (datasets.isEmpty) { out.println("no datasets"); return 0 }
    var failures = 0
    datasets.foreach { case (name, d) =>
      val blocks = d.chain.blockHashes().size
      val slices = d.chain.slices().size
      val wm = d.chain.watermark()
        .map(m => java.time.Instant.ofEpochMilli(m).toString).getOrElse("-")
      val issues = Maintenance.verify(d)
      val status = if (issues.isEmpty) "ok" else { failures += 1; "FAIL" }
      out.println(s"$name\t${d.kind}\tblocks=$blocks\tslices=$slices\twatermark=$wm\t$status")
      issues.foreach(i => out.println(s"  issue: ${i.msg}"))
    }
    if (failures == 0) 0 else 1
  }

  /** Emit a shell completion script (kamu completions, completions_command
    * .rs — bash only here; the word list is the real `Subcommands`). */
  private def cmdCompletions(shell: String, out: PrintStream): Int = shell match {
    case "bash" =>
      out.println(
        s"""_graft() {
           |  local cur=$${COMP_WORDS[COMP_CWORD]}
           |  if [ $$COMP_CWORD -eq 1 ]; then
           |    COMPREPLY=( $$(compgen -W "${Subcommands.mkString(" ")}" -- "$$cur") )
           |  fi
           |}
           |complete -F _graft graft""".stripMargin)
      0
    case other =>
      out.println(s"error: unsupported shell '$other' (bash)")
      2
  }

  /** Print a DatasetSnapshot manifest template to stdout (kamu new,
    * new_dataset_command.rs — the reference writes `<name>.yaml`; this
    * prints, so `graft new x > x.json` composes with `graft add x.json`). */
  private def cmdNew(name: String, derivative: Boolean, out: PrintStream): Int = {
    val body =
      if (derivative)
        s"""{ "name": "$name", "kind": "derivative",
           |  "metadata": [
           |    { "kind": "SetTransform",
           |      "inputs": ["my_input"],
           |      "steps": [ { "query": "SELECT op, event_time, * EXCEPT (op, event_time) FROM my_input" } ] }
           |  ] }""".stripMargin
      else
        s"""{ "name": "$name", "kind": "root",
           |  "metadata": [
           |    { "kind": "SetPollingSource", "readFormat": "csv",
           |      "schemaDdl": "id BIGINT, value STRING",
           |      "merge": { "kind": "ledger", "primaryKey": ["id"] } },
           |    { "kind": "SetInfo", "description": "describe $name here" }
           |  ] }""".stripMargin
    out.println(body)
    0
  }

  /** Garbage-collect one dataset (or, with no argument, every dataset in the
    * workspace) — gc_command.rs. */
  private def cmdGc(spark: SparkSession, ws: String, ds: Option[String],
      out: PrintStream): Int = {
    val targets = ds match {
      case Some(n) => Seq(n -> open(spark, ws, n))
      case None    => workspaceDatasets(spark, ws).toSeq.sortBy(_._1)
    }
    var total = 0L
    targets.foreach { case (name, d) =>
      val r = Maintenance.gc(d)
      total += r.bytesReclaimed
      if (r.bytesReclaimed > 0 || r.stagingFilesDeleted > 0)
        out.println(s"$name: ${r.blocksDeleted} block(s), ${r.dataFilesDeleted} data file(s), " +
          s"${r.checkpointDirsDeleted} checkpoint dir(s), ${r.stagingFilesDeleted} staging " +
          s"item(s), ${r.bytesReclaimed} bytes")
    }
    out.println(s"reclaimed $total bytes")
    0
  }

  private def cmdVerify(spark: SparkSession, ws: String, ds: String, out: PrintStream): Int = {
    val issues = Maintenance.verify(open(spark, ws, ds))
    if (issues.isEmpty) { out.println("ok"); 0 }
    else {
      issues.foreach(i => out.println(s"issue: $i"))
      // integrity failures page subscribers through the signed queue
      graft.adapter.Webhooks.notifyEvent(
        webhookRegistry(spark, ws), ds, graft.adapter.Webhooks.EventVerificationFailed,
        graft.adapter.Webhooks.verificationFailedPayload(ds, issues.mkString("; ")),
        System.currentTimeMillis())
      1
    }
  }

  private def cmdCompact(spark: SparkSession, ws: String, ds: String,
      maxRecords: Option[Long], out: PrintStream): Int = {
    val before = open(spark, ws, ds)
    val nBefore = before.chain.slices().size
    // explicit arg > workspace config > library default
    val limit = maxRecords
      .orElse(workspaceConfig(spark, ws).getLong("compact.maxSliceRecords"))
      .getOrElse(300000L)
    val after = Maintenance.compact(before, maxRecords = limit)
    out.println(s"slices: $nBefore -> ${after.chain.slices().size}")
    0
  }

  private def cmdReset(spark: SparkSession, ws: String, ds: String, hash: String,
      out: PrintStream): Int = {
    open(spark, ws, ds).chain.reset(hash)
    out.println(s"head reset to $hash")
    0
  }
}
