package graft

import java.io.{BufferedReader, ByteArrayOutputStream, PrintStream, StringReader}
import java.nio.file.Files

import graft.dataset.Dataset
import graft.ingest.IngestWriter
import graft.model.MergeConf
import graft.model.MetadataEvent.SetPollingSource

/** Scripted stdin/stdout coverage of every Cli subcommand against a temp
  * workspace (the reference's e2e CLI suites, in miniature). */
class CliSpec extends SparkSpec {

  private def runCli(args: String*): (Int, String) = runCliIn("", args: _*)

  private def runCliIn(stdin: String, args: String*): (Int, String) = {
    val bos = new ByteArrayOutputStream()
    val code = Cli.run(spark, args.toSeq, new BufferedReader(new StringReader(stdin)),
      new PrintStream(bos, true, "UTF-8"))
    (code, bos.toString("UTF-8"))
  }

  private lazy val ws = {
    val root = Files.createTempDirectory("graft-cli-ws-")
    val csv = root.resolve("cities.csv")
    Files.writeString(csv, "city,population\nvancouver,675000\nseattle,733000\n")
    val ds = Dataset.create(spark, root.resolve("cities"), "cities")
    ds.chain.append(
      SetPollingSource(readFormat = "csv", schemaDdl = Some("city STRING, population INT"),
        merge = MergeConf("snapshot", primaryKey = Seq("city"))), 0L)
    IngestWriter.ingestFile(ds, csv.toString,
      java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli)
    (root, csv)
  }

  test("list names workspace datasets") {
    val (root, _) = ws
    val (code, outStr) = runCli("--workspace", root.toString, "list")
    assert(code === 0 && outStr.trim === "cities")
  }

  test("sql -c runs one statement as CSV") {
    val (root, _) = ws
    val (code, outStr) = runCli("--workspace", root.toString,
      "sql", "-c", "SELECT city, population FROM cities ORDER BY city")
    assert(code === 0)
    assert(outStr.linesIterator.toSeq === Seq("city,population", "seattle,733000", "vancouver,675000"))
  }

  test("sql REPL executes statements line by line, survives errors, exits") {
    val (root, _) = ws
    val script = "SELECT count(*) AS n FROM cities\nSELECT broken FROM nowhere\nexit\n"
    val (code, outStr) = runCliIn(script, "--workspace", root.toString, "sql")
    assert(code === 0)
    assert(outStr.contains("n\n2") || outStr.contains("n\r\n2"))
    assert(outStr.contains("error:"))
  }

  test("tail and schema") {
    val (root, _) = ws
    val (c1, tailOut) = runCli("--workspace", root.toString, "tail", "cities", "1")
    assert(c1 === 0 && tailOut.linesIterator.size === 2) // header + 1 row
    val (c2, ddl) = runCli("--workspace", root.toString, "schema", "cities")
    assert(c2 === 0 && ddl.contains("city") && ddl.contains("population"))
  }

  test("log lists chain blocks newest-first") {
    val (root, _) = ws
    val (code, outStr) = runCli("--workspace", root.toString, "log", "cities")
    assert(code === 0)
    val kinds = outStr.linesIterator.map(_.split(" ").last).toSeq
    assert(kinds.head === "AddData" && kinds.last === "Seed")
  }

  test("ingest is idempotent (second identical round reports up to date)") {
    val (root, csv) = ws
    val (code, outStr) = runCli("--workspace", root.toString,
      "ingest", "cities", csv.toString, "2024-02-01T00:00:00Z")
    assert(code === 0 && outStr.trim === "up to date")
  }

  test("verify reports ok; compact folds slices; reset rewinds") {
    val (root, csv) = ws
    // second batch so compaction has two slices to fold
    Files.writeString(csv, "city,population\nvancouver,675000\nseattle,733000\nkyiv,2884000\n")
    val (ci, ingOut) = runCli("--workspace", root.toString,
      "ingest", "cities", csv.toString, "2024-03-01T00:00:00Z")
    assert(ci === 0 && ingOut.contains("committed"))

    val (cv, vOut) = runCli("--workspace", root.toString, "verify", "cities")
    assert(cv === 0 && vOut.trim === "ok")

    val (cc, cOut) = runCli("--workspace", root.toString, "compact", "cities")
    assert(cc === 0 && cOut.contains("-> 1"))

    // reset to the post-compaction head (compaction rewrote the chain, so
    // pre-compaction hashes are gone; a head reset is still a full exercise
    // of the command path)
    val headAfter = Dataset.open(spark, root.resolve("cities")).chain.head.get._2
    val (cr, rOut) = runCli("--workspace", root.toString, "reset", "cities", headAfter)
    assert(cr === 0 && rOut.contains(headAfter))
  }

  test("unknown command and unknown dataset fail with nonzero exit") {
    val (root, _) = ws
    assert(runCli("--workspace", root.toString, "frobnicate")._1 === 2)
    val (code, outStr) = runCli("--workspace", root.toString, "tail", "nope")
    assert(code === 1 && outStr.contains("error:"))
  }

  test("add creates a dataset from a DatasetSnapshot manifest; it ingests and queries") {
    val root = Files.createTempDirectory("graft-cli-add-")
    val manifest = root.resolve("towns.json")
    Files.writeString(manifest,
      """{ "name": "towns", "kind": "root",
        |  "metadata": [
        |    { "kind": "SetPollingSource", "readFormat": "csv",
        |      "schemaDdl": "town STRING, pop INT",
        |      "merge": { "kind": "snapshot", "primaryKey": ["town"] } },
        |    { "kind": "SetInfo", "description": "test towns" } ] }""".stripMargin)
    val (code, outStr) = runCli("--workspace", root.toString,
      "add", manifest.toString, "2024-01-01T00:00:00Z")
    assert(code === 0 && outStr.trim === "added towns (root), 3 blocks", outStr)

    // duplicate add is rejected
    assert(runCli("--workspace", root.toString, "add", manifest.toString)._1 === 1)

    // the manifest-declared source drives a real ingest round
    val csv = root.resolve("t.csv")
    Files.writeString(csv, "town,pop\nnola,364000\n")
    val (ci, _) = runCli("--workspace", root.toString,
      "ingest", "towns", csv.toString, "2024-01-02T00:00:00Z")
    assert(ci === 0)
    val (ct, tailOut) = runCli("--workspace", root.toString, "tail", "towns", "1")
    assert(ct === 0 && tailOut.contains("nola"), tailOut)
  }

  test("export writes full history in each format") {
    val (root, _) = ws
    val dir = Files.createTempDirectory("graft-cli-export-")
    val (code, outStr) = runCli("--workspace", root.toString,
      "export", "cities", dir.resolve("out_csv").toString, "csv")
    // other tests ingest into the shared workspace dataset; count is theirs
    assert(code === 0 && "exported \\d+ records".r.findFirstIn(outStr).isDefined, outStr)
    val files = Files.list(dir.resolve("out_csv")).toArray.map(_.toString)
    assert(files.exists(_.endsWith(".csv")), files.mkString(","))
    assert(runCli("--workspace", root.toString,
      "export", "cities", dir.resolve("out_bad").toString, "xlsx")._1 === 2)
  }

  test("serve runs the REST surface until stdin says exit") {
    val (root, _) = ws
    val outBuf = new ByteArrayOutputStream()
    val pipeOut = new java.io.PipedWriter()
    val pipeIn = new BufferedReader(new java.io.PipedReader(pipeOut))
    val runner = new Thread(() => {
      Cli.run(spark, Seq("--workspace", root.toString, "serve"), pipeIn,
        new PrintStream(outBuf, true, "UTF-8"))
    })
    runner.start()
    try {
      // wait for the bound-port line, then hit the REST tail endpoint
      val port = Iterator.range(0, 100).map { _ =>
        Thread.sleep(100)
        "rest: http://127.0.0.1:(\\d+)".r.findFirstMatchIn(outBuf.toString("UTF-8")).map(_.group(1))
      }.collectFirst { case Some(p) => p }.getOrElse(fail("serve never printed its port"))
      val body = new String(
        new java.net.URL(s"http://127.0.0.1:$port/datasets/cities/tail?n=1")
          .openStream().readAllBytes(), "UTF-8")
      assert(body.contains("population"), body)
    } finally {
      pipeOut.write("exit\n"); pipeOut.flush(); pipeOut.close()
      runner.join(15000)
      assert(!runner.isAlive, "serve did not shut down on 'exit'")
    }
  }

  test("serve --flow-interval co-runs the flow agent: due datasets pull without manual ticks") {
    val root = Files.createTempDirectory("graft-cli-serveflow-")
    Files.writeString(root.resolve("t-2024-01-01.csv"), "town,pop\nnola,364000\n")
    val towns = Dataset.create(spark, root.resolve("towns"), "towns")
    towns.chain.append(
      SetPollingSource(readFormat = "csv", schemaDdl = Some("town STRING, pop INT"),
        merge = MergeConf("ledger", primaryKey = Seq("town")),
        fetch = Some(graft.model.MetadataEvent.FetchConf(kind = "filesGlob",
          glob = Some(root.resolve("t-*.csv").toString),
          eventTimeRegex = Some("t-(\\d{4}-\\d{2}-\\d{2})\\.csv")))), 0L)
    // schedule is due immediately (never ran)
    val (cs, _) = {
      val bos = new ByteArrayOutputStream()
      (Cli.run(spark, Seq("--workspace", root.toString, "flow", "set", "towns", "every", "1h"),
        new BufferedReader(new java.io.StringReader("")),
        new PrintStream(bos, true, "UTF-8")), bos)
    }
    assert(cs === 0)

    val outBuf = new ByteArrayOutputStream()
    val pipeOut = new java.io.PipedWriter()
    val pipeIn = new BufferedReader(new java.io.PipedReader(pipeOut))
    val runner = new Thread(() => {
      Cli.run(spark,
        Seq("--workspace", root.toString, "serve", "--flow-interval", "200ms"),
        pipeIn, new PrintStream(outBuf, true, "UTF-8"))
    })
    runner.start()
    try {
      // very generous window: under the full parallel suite (38 suites on
      // one shared local Spark) a single pull's jobs can sit queued for
      // minutes — the exists() exits on success, so the healthy-path cost
      // stays a couple of seconds and the window only pays off under load
      val pulled = Iterator.range(0, 2400).exists { _ =>
        Thread.sleep(100)
        Dataset.open(spark, root.resolve("towns")).chain.lastOffset().contains(0L)
      }
      assert(pulled, s"flow agent never pulled:\n${outBuf.toString("UTF-8")}")
      // the chain commit is observable BEFORE the agent prints its status
      // line (the tick still runs webhook scans in between) — poll briefly
      val printed = Iterator.range(0, 300).exists { _ =>
        if (outBuf.toString("UTF-8").contains("flow towns: pulled")) true
        else { Thread.sleep(100); false }
      }
      assert(printed, s"status line never printed:\n${outBuf.toString("UTF-8")}")
    } finally {
      pipeOut.write("exit\n"); pipeOut.flush(); pipeOut.close()
      runner.join(60000)
      assert(!runner.isAlive, "serve did not shut down on 'exit'")
    }
  }

  test("pull runs the dependency graph: poll root, transform derivative, then no-op") {
    import graft.model.MetadataEvent.{FetchConf, SqlStep}
    import graft.transform.TransformService
    val root = Files.createTempDirectory("graft-cli-pull-")
    Files.writeString(root.resolve("towns-2024-01-01.csv"), "town,pop\nnola,364000\n")
    val towns = Dataset.create(spark, root.resolve("towns"), "towns")
    towns.chain.append(
      SetPollingSource(readFormat = "csv", schemaDdl = Some("town STRING, pop INT"),
        merge = MergeConf("ledger", primaryKey = Seq("town")),
        fetch = Some(FetchConf(kind = "filesGlob",
          glob = Some(root.resolve("towns-*.csv").toString),
          eventTimeRegex = Some("towns-(\\d{4}-\\d{2}-\\d{2})\\.csv")))), 0L)
    val big = Dataset.create(spark, root.resolve("towns_big"), "towns_big", kind = "derivative")
    TransformService.setTransform(big, Seq("towns"),
      Seq(SqlStep(None, "SELECT op, event_time, town, pop * 2 AS pop FROM towns")), 0L)

    val (c1, out1) = runCli("--workspace", root.toString, "pull", "towns_big",
      "2024-01-02T00:00:00Z")
    assert(c1 === 0, out1)
    assert(out1.linesIterator.toSeq === Seq(
      "towns: committed offsets 0..0", "towns_big: transformed, offsets 0..0"), out1)

    val (c2, out2) = runCli("--workspace", root.toString, "pull", "towns_big",
      "2024-01-03T00:00:00Z")
    assert(c2 === 0)
    assert(out2.linesIterator.toSeq === Seq("towns: up to date", "towns_big: up to date"), out2)

    val (c3, out3) = runCli("--workspace", root.toString, "lineage", "towns_big")
    assert(c3 === 0)
    assert(out3 === "towns_big (derivative)\n└── towns (root)\n", out3)

    // inspect: the derivative shows its transform, the root its source
    val (c4, out4) = runCli("--workspace", root.toString, "inspect", "towns_big")
    assert(c4 === 0, out4)
    assert(out4.linesIterator.toSeq === Seq("towns_big (derivative)", "inputs: towns",
      "SELECT op, event_time, town, pop * 2 AS pop FROM towns"), out4)
    val (c5, out5) = runCli("--workspace", root.toString, "inspect", "towns")
    assert(c5 === 0 && out5.contains("no transform declared") &&
      out5.contains("merge=ledger pk=town"), out5)

    // depgraph form: Graphviz DOT with styled nodes and input edges
    val (c6, dot) = runCli("--workspace", root.toString, "lineage", "towns_big", "--dot")
    assert(c6 === 0, dot)
    assert(dot.linesIterator.toSeq === Seq(
      "digraph datasets {", "rankdir = LR;",
      "\"towns\" [shape=box];", "\"towns_big\" [shape=ellipse];",
      "\"towns\" -> \"towns_big\";", "}"), dot)

    // decode prints one block's JSON by hash; a bogus hash errors
    val head = Dataset.open(spark, root.resolve("towns")).chain.head.get._2
    val (c7, blockJson) = runCli("--workspace", root.toString, "decode", "towns", head)
    assert(c7 === 0 && blockJson.contains("\"kind\"") &&
      blockJson.contains("\"AddData\""), blockJson)
    assert(runCli("--workspace", root.toString, "decode", "towns", "f" * 64)._1 === 1)
  }

  test("search finds datasets by name substring; misses exit nonzero") {
    val (root, _) = ws
    val (c1, hit) = runCli("--workspace", root.toString, "search", "CITI")
    assert(c1 === 0 && hit.startsWith("cities\tname\tcities"), hit)
    val (c2, miss) = runCli("--workspace", root.toString, "search", "zzz-nope")
    assert(c2 === 1 && miss.trim === "(no matches)")
  }

  test("flow set/list/run/rm: scheduled pulls through the CLI") {
    // private workspace: the flow executor POLLS roots, so the dataset needs
    // a real fetch step (the shared fixture is ingest-file-driven)
    val root = Files.createTempDirectory("graft-cli-flow-")
    Files.writeString(root.resolve("f-2024-01-01.csv"), "town,pop\nnola,364000\n")
    val towns = Dataset.create(spark, root.resolve("towns"), "towns")
    towns.chain.append(
      SetPollingSource(readFormat = "csv", schemaDdl = Some("town STRING, pop INT"),
        merge = MergeConf("ledger", primaryKey = Seq("town")),
        fetch = Some(graft.model.MetadataEvent.FetchConf(kind = "filesGlob",
          glob = Some(root.resolve("f-*.csv").toString),
          eventTimeRegex = Some("f-(\\d{4}-\\d{2}-\\d{2})\\.csv")))), 0L)

    val (c1, setOut) = runCli("--workspace", root.toString, "flow", "set", "towns", "every", "1h")
    assert(c1 === 0 && setOut.trim === "scheduled towns: every 1h")
    // bad schedule and unknown dataset are rejected
    assert(runCli("--workspace", root.toString, "flow", "set", "towns", "sometimes")._1 === 1)
    assert(runCli("--workspace", root.toString, "flow", "set", "nope", "every", "1h")._1 === 1)

    val (_, list1) = runCli("--workspace", root.toString, "flow", "list")
    assert(list1.trim === "towns\tevery 1h\tlast-run=never", list1)

    val (c2, run1) = runCli("--workspace", root.toString, "flow", "run", "2024-06-01T00:00:00Z")
    assert(c2 === 0 && run1.trim === "towns: pulled", run1)
    val (_, run2) = runCli("--workspace", root.toString, "flow", "run", "2024-06-01T00:30:00Z")
    assert(run2.trim === "towns: not due", run2)
    val (_, run3) = runCli("--workspace", root.toString, "flow", "run", "2024-06-01T01:00:00Z")
    assert(run3.trim === "towns: pulled", run3)
    val (_, list2) = runCli("--workspace", root.toString, "flow", "list")
    assert(list2.contains("last-run=2024-06-01T01:00:00Z"), list2)

    val (c3, _) = runCli("--workspace", root.toString, "flow", "rm", "towns")
    assert(c3 === 0)
    assert(runCli("--workspace", root.toString, "flow", "list")._2.trim.isEmpty)
  }

  test("flow set --reactive: event-driven derivative updates through the CLI") {
    val root = Files.createTempDirectory("graft-cli-reactive-")
    Files.writeString(root.resolve("f-2024-01-01.csv"), "town,pop\nnola,364000\n")
    val towns = Dataset.create(spark, root.resolve("towns"), "towns")
    towns.chain.append(
      SetPollingSource(readFormat = "csv", schemaDdl = Some("town STRING, pop INT"),
        merge = MergeConf("ledger", primaryKey = Seq("town")),
        fetch = Some(graft.model.MetadataEvent.FetchConf(kind = "filesGlob",
          glob = Some(root.resolve("f-*.csv").toString),
          eventTimeRegex = Some("f-(\\d{4}-\\d{2}-\\d{2})\\.csv")))), 0L)
    val big = Dataset.create(spark, root.resolve("towns_big"), "towns_big", kind = "derivative")
    graft.transform.TransformService.setTransform(big, Seq("towns"),
      Seq(graft.model.MetadataEvent.SqlStep(None,
        "SELECT op, event_time, town, pop * 2 AS pop FROM towns")), 0L)

    // lifecycle: set, visible in list, bad rule/dataset rejected
    val (c1, setOut) = runCli("--workspace", root.toString,
      "flow", "set", "towns_big", "--reactive", "buffer:2:1h")
    assert(c1 === 0 && setOut.trim === "reactive towns_big: buffer:2:1h")
    assert(runCli("--workspace", root.toString,
      "flow", "set", "towns_big", "--reactive", "sometimes")._1 === 1)
    assert(runCli("--workspace", root.toString,
      "flow", "set", "nope", "--reactive", "immediate")._1 === 1)
    val (_, list1) = runCli("--workspace", root.toString, "flow", "list")
    assert(list1.trim === "towns_big\treactive=buffer:2:1h\tlast-run=never", list1)

    // upstream ingests one record (its own flow): downstream batches…
    assert(graft.ingest.IngestWriter.pollOnce(
      graft.dataset.Dataset.open(spark, root.resolve("towns")),
      java.time.Instant.parse("2024-06-01T00:00:00Z").toEpochMilli).isDefined)
    val (_, run1) = runCli("--workspace", root.toString, "flow", "run", "2024-06-01T00:10:00Z")
    assert(run1.trim === "towns_big: batching 1/2 records until 2024-06-01T01:00:00Z", run1)
    // …and a second record crosses the threshold on the next tick
    Files.writeString(root.resolve("f-2024-01-02.csv"), "town,pop\nkyiv,2884000\n")
    assert(graft.ingest.IngestWriter.pollOnce(
      graft.dataset.Dataset.open(spark, root.resolve("towns")),
      java.time.Instant.parse("2024-06-01T00:20:00Z").toEpochMilli).isDefined)
    val (_, run2) = runCli("--workspace", root.toString, "flow", "run", "2024-06-01T00:30:00Z")
    assert(run2.trim === "towns_big: pulled", run2)
    assert(graft.dataset.Dataset.open(spark, root.resolve("towns_big"))
      .chain.lastOffset() === Some(1L))

    // pause holds the trigger (still listed, marked PAUSED), resume restores
    Files.writeString(root.resolve("f-2024-01-03.csv"), "town,pop\nlima,9752000\n")
    assert(graft.ingest.IngestWriter.pollOnce(
      graft.dataset.Dataset.open(spark, root.resolve("towns")),
      java.time.Instant.parse("2024-06-01T00:40:00Z").toEpochMilli).isDefined)
    assert(runCli("--workspace", root.toString, "flow", "pause", "towns_big")._1 === 0)
    val (_, runP) = runCli("--workspace", root.toString, "flow", "run", "2024-06-01T00:50:00Z")
    assert(runP.trim === "towns_big: paused", runP)
    assert(runCli("--workspace", root.toString, "flow", "list")._2.contains("PAUSED"))
    assert(runCli("--workspace", root.toString, "flow", "resume", "towns_big")._1 === 0)
    // resumed: the rule evaluates again (1 new record < the buffer of 2)
    val (_, runR) = runCli("--workspace", root.toString, "flow", "run", "2024-06-01T00:55:00Z")
    assert(runR.trim.startsWith("towns_big: batching 1/2"), runR)

    // off detaches the trigger
    val (c2, offOut) = runCli("--workspace", root.toString,
      "flow", "set", "towns_big", "--reactive", "off")
    assert(c2 === 0 && offOut.trim === "reactive towns_big: off")
    assert(runCli("--workspace", root.toString, "flow", "list")._2.trim.isEmpty)
  }

  test("set-watermark/delete/rename/gc: dataset lifecycle commands") {
    import graft.model.MetadataEvent.SqlStep
    import graft.transform.TransformService
    val root = Files.createTempDirectory("graft-cli-life-")
    Files.writeString(root.resolve("t.csv"), "town,pop\nnola,364000\nbr,227000\n")
    val towns = Dataset.create(spark, root.resolve("towns"), "towns")
    towns.chain.append(
      SetPollingSource(readFormat = "csv", schemaDdl = Some("town STRING, pop INT"),
        merge = MergeConf("ledger", primaryKey = Seq("town"))), 0L)
    IngestWriter.ingestFile(towns, root.resolve("t.csv").toString,
      java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli)
    val big = Dataset.create(spark, root.resolve("towns_big"), "towns_big", kind = "derivative")
    TransformService.setTransform(big, Seq("towns"),
      Seq(SqlStep(None, "SELECT op, event_time, town, pop * 2 AS pop FROM towns")), 0L)

    // ---- set-watermark: advances without data; scans unaffected
    val (w1, wOut) = runCli("--workspace", root.toString, "set-watermark", "towns",
      "2024-02-01T00:00:00Z")
    assert(w1 === 0 && wOut.trim === "watermark set to 2024-02-01T00:00:00Z", wOut)
    assert(towns.chain.watermark() ===
      Some(java.time.Instant.parse("2024-02-01T00:00:00Z").toEpochMilli))
    val (q1, qOut) = runCli("--workspace", root.toString, "sql", "-c",
      "SELECT count(*) AS n FROM towns")
    assert(q1 === 0 && qOut.contains("2"), qOut)
    // regression and derivative targets are refused
    assert(runCli("--workspace", root.toString, "set-watermark", "towns",
      "2024-01-15T00:00:00Z")._1 === 1)
    assert(runCli("--workspace", root.toString, "set-watermark", "towns_big",
      "2024-03-01T00:00:00Z")._1 === 1)
    // integrity verification tolerates the data-less block
    val (v1, vOut) = runCli("--workspace", root.toString, "verify", "towns")
    assert(v1 === 0 && vOut.trim === "ok", vOut)
    // compaction carries the block-level watermark onto the rewritten slice
    graft.maintenance.Maintenance.compact(towns)
    assert(towns.chain.watermark() ===
      Some(java.time.Instant.parse("2024-02-01T00:00:00Z").toEpochMilli))
    assert(runCli("--workspace", root.toString, "verify", "towns")._2.trim === "ok")

    // ---- rename: refused while dependents read it by name; derivative renames
    val (r1, rOut) = runCli("--workspace", root.toString, "rename", "towns", "cities2")
    assert(r1 === 1 && rOut.contains("towns_big"), rOut)
    assert(runCli("--workspace", root.toString, "flow", "set", "towns_big", "every", "1h")._1 === 0)
    assert(runCli("--workspace", root.toString, "alias", "add", "towns_big", "origin")._1 === 0)
    val (r2, _) = runCli("--workspace", root.toString, "rename", "towns_big", "towns_huge")
    assert(r2 === 0)
    val (_, ls) = runCli("--workspace", root.toString, "list")
    assert(ls.linesIterator.toSeq.sorted === Seq("towns", "towns_huge"), ls)
    // the flow schedule and remote aliases followed the rename
    val (_, fl) = runCli("--workspace", root.toString, "flow", "list")
    assert(fl.startsWith("towns_huge\t"), fl)
    val (_, al) = runCli("--workspace", root.toString, "alias", "list")
    assert(al.linesIterator.forall(_.startsWith("towns_huge\t")) && al.nonEmpty, al)
    // rename onto an existing name is refused
    assert(runCli("--workspace", root.toString, "rename", "towns_huge", "towns")._1 === 1)

    // ---- delete: refused while dependents exist; force or bottom-up works
    val (d1, dOut) = runCli("--workspace", root.toString, "delete", "towns")
    assert(d1 === 1 && dOut.contains("towns_huge"), dOut)
    assert(runCli("--workspace", root.toString, "delete", "towns_huge")._1 === 0)
    // delete dropped the renamed dataset's alias entries too
    assert(runCli("--workspace", root.toString, "alias", "list")._2.trim.isEmpty)
    assert(runCli("--workspace", root.toString, "delete", "towns")._1 === 0)
    assert(runCli("--workspace", root.toString, "list")._2.trim.isEmpty)
    // deleting a missing dataset errors
    assert(runCli("--workspace", root.toString, "delete", "towns")._1 === 1)
  }

  test("gc reclaims unreachable blocks, orphan slices, and staging leftovers") {
    val root = Files.createTempDirectory("graft-cli-gc-")
    Files.writeString(root.resolve("a.csv"), "town,pop\nnola,364000\n")
    Files.writeString(root.resolve("b.csv"), "town,pop\nbr,227000\n")
    val towns = Dataset.create(spark, root.resolve("towns"), "towns")
    towns.chain.append(
      SetPollingSource(readFormat = "csv", schemaDdl = Some("town STRING, pop INT"),
        merge = MergeConf("ledger", primaryKey = Seq("town"))), 0L)
    IngestWriter.ingestFile(towns, root.resolve("a.csv").toString, 1000L)
    val headAfterFirst = towns.chain.head.get._2
    IngestWriter.ingestFile(towns, root.resolve("b.csv").toString, 2000L)
    // leave a staging leftover like a crashed sync would
    val staging = new org.apache.hadoop.fs.Path(towns.chain.root, "staging")
    towns.chain.fs.mkdirs(staging)
    val o = towns.chain.fs.create(new org.apache.hadoop.fs.Path(staging, "crashed"), true)
    o.write("partial".getBytes("UTF-8")); o.close()

    // nothing unreachable yet except staging
    val (g1, gOut1) = runCli("--workspace", root.toString, "gc", "towns")
    assert(g1 === 0 && gOut1.contains("1 staging item(s)"), gOut1)

    // reset strands the second ingest's block + slice; gc reclaims both
    towns.chain.reset(headAfterFirst)
    val (g2, gOut2) = runCli("--workspace", root.toString, "gc")
    assert(g2 === 0 && gOut2.contains("towns: 1 block(s), 1 data file(s)"), gOut2)
    // the dataset still reads fine at the rewound head
    val (q, qOut) = runCli("--workspace", root.toString, "sql", "-c",
      "SELECT count(*) AS n FROM towns")
    assert(q === 0 && qOut.contains("1"), qOut)
    // second gc finds nothing
    val (g3, gOut3) = runCli("--workspace", root.toString, "gc", "towns")
    assert(g3 === 0 && gOut3.trim === "reclaimed 0 bytes", gOut3)
  }

  test("alias add/list/rm: per-dataset remotes drive push/status/pull --from") {
    val root = Files.createTempDirectory("graft-cli-alias-")
    Files.writeString(root.resolve("a.csv"), "town,pop\nnola,364000\n")
    val towns = Dataset.create(spark, root.resolve("towns"), "towns")
    towns.chain.append(
      SetPollingSource(readFormat = "csv", schemaDdl = Some("town STRING, pop INT"),
        merge = MergeConf("ledger", primaryKey = Seq("town"))), 0L)
    IngestWriter.ingestFile(towns, root.resolve("a.csv").toString, 1000L)
    val repo = Files.createTempDirectory("graft-cli-alias-repo-")

    // no alias -> push without a remote fails with guidance
    val (c0, e0) = runCli("--workspace", root.toString, "push", "towns")
    assert(c0 === 1 && e0.contains("no push alias"), e0)

    assert(runCli("--workspace", root.toString, "repo", "add", "origin", repo.toString)._1 === 0)
    val (c1, a1) = runCli("--workspace", root.toString, "alias", "add", "towns", "origin")
    assert(c1 === 0 && a1.trim === "aliased towns -> origin (push,pull)", a1)
    val (_, lst) = runCli("--workspace", root.toString, "alias", "list")
    assert(lst.linesIterator.toSeq === Seq("towns\tpush\torigin", "towns\tpull\torigin"), lst)

    // push + status through the alias, no remote named
    val (c2, p1) = runCli("--workspace", root.toString, "push", "towns")
    assert(c2 === 0 && p1.startsWith("synced"), p1)
    val (c3, st) = runCli("--workspace", root.toString, "status", "towns")
    assert(c3 === 0 && st.trim === "equal", st)

    // a second workspace pulls through its own pull alias
    val ws2 = Files.createTempDirectory("graft-cli-alias-ws2-")
    assert(runCli("--workspace", ws2.toString, "repo", "add", "up", repo.toString)._1 === 0)
    assert(runCli("--workspace", ws2.toString, "alias", "add", "towns", "up", "--pull")._1 === 0)
    val (c4, p2) = runCli("--workspace", ws2.toString, "pull", "towns", "--from")
    assert(c4 === 0 && p2.startsWith("synced"), p2)

    // ambiguity is an error; rm restores the single-alias path
    assert(runCli("--workspace", root.toString, "alias", "add", "towns", "elsewhere", "--push")._1 === 0)
    val (c5, e5) = runCli("--workspace", root.toString, "push", "towns")
    assert(c5 === 1 && e5.contains("2 push aliases"), e5)
    assert(runCli("--workspace", root.toString, "alias", "rm", "towns", "elsewhere", "--push")._1 === 0)
    assert(runCli("--workspace", root.toString, "push", "towns")._2.trim === "up to date")
  }

  test("diagnose reports workspace health and flags a tampered dataset") {
    val root = Files.createTempDirectory("graft-cli-diag-")
    Files.writeString(root.resolve("a.csv"), "town,pop\nnola,364000\n")
    val towns = Dataset.create(spark, root.resolve("towns"), "towns")
    towns.chain.append(
      SetPollingSource(readFormat = "csv", schemaDdl = Some("town STRING, pop INT"),
        merge = MergeConf("ledger", primaryKey = Seq("town"))), 0L)
    IngestWriter.ingestFile(towns, root.resolve("a.csv").toString, 1000L)
    val (c1, ok) = runCli("--workspace", root.toString, "diagnose")
    assert(c1 === 0 && ok.startsWith("towns\troot\tblocks=4\tslices=1") &&
      ok.trim.endsWith("ok"), ok)
    // tamper a slice: diagnose fails with the issue listed
    val ph = towns.chain.slices().head.physicalHash
    val slicePath = java.nio.file.Paths.get(towns.chain.dataFile(ph).toUri)
    Files.write(slicePath, Files.readAllBytes(slicePath) ++ Array[Byte](1))
    val (c2, bad) = runCli("--workspace", root.toString, "diagnose")
    assert(c2 === 1 && bad.contains("FAIL") && bad.contains("issue:"), bad)
  }

  test("completions emits a bash script covering every subcommand") {
    val (c, script) = runCli("completions", "bash")
    assert(c === 0 && script.contains("complete -F _graft graft"), script)
    Seq("push", "set-watermark", "gc", "rename", "decode").foreach(w =>
      assert(script.contains(w), s"missing $w"))
    assert(runCli("completions", "tcsh")._1 === 2)
  }

  test("new prints a manifest template that add accepts") {
    val root = Files.createTempDirectory("graft-cli-new-")
    val (c1, manifest) = runCli("new", "sensors")
    assert(c1 === 0 && manifest.contains("\"SetPollingSource\""), manifest)
    val f = root.resolve("sensors.json")
    Files.writeString(f, manifest)
    val (c2, added) = runCli("--workspace", root.toString, "add", f.toString)
    assert(c2 === 0 && added.contains("added sensors (root)"), added)
    // derivative template declares a transform
    val (c3, dtempl) = runCli("new", "doubled", "--derivative")
    assert(c3 === 0 && dtempl.contains("\"SetTransform\""), dtempl)
  }

  test("repo/push/status/pull --from: full remote sync lifecycle") {
    val (root, csv) = ws
    val remote = Files.createTempDirectory("graft-cli-remote-")

    val (cAdd, _) = runCli("--workspace", root.toString,
      "repo", "add", "origin", remote.toUri.toString)
    assert(cAdd === 0)
    val (cList, listOut) = runCli("--workspace", root.toString, "repo", "list")
    assert(cList === 0 && listOut.startsWith("origin "))

    // before any push the remote is absent
    val (_, absent) = runCli("--workspace", root.toString, "status", "cities", "origin")
    assert(absent.trim === "remote: absent")

    val (cPush, pushOut) = runCli("--workspace", root.toString, "push", "cities", "origin")
    assert(cPush === 0 && pushOut.startsWith("synced "), pushOut)
    val (_, eq) = runCli("--workspace", root.toString, "status", "cities", "origin")
    assert(eq.trim === "equal")

    // a local commit makes us ahead; pushing again moves only the delta
    val (_, _) = runCli("--workspace", root.toString,
      "ingest", "cities", csv.toString, "2024-03-01T00:00:00Z") // up to date, no-op
    IngestWriter.ingestFile(Dataset.open(spark, root.resolve("cities")),
      { val f = root.resolve("more.csv")
        Files.writeString(f, "city,population\nvancouver,675000\nseattle,733000\nkyiv,2884000\nodessa,1015000\n")
        f.toString },
      java.time.Instant.parse("2024-04-01T00:00:00Z").toEpochMilli)
    val (_, ahead) = runCli("--workspace", root.toString, "status", "cities", "origin")
    assert(ahead.trim === "ahead 1", ahead)
    val (cPush2, push2) = runCli("--workspace", root.toString, "push", "cities", "origin")
    assert(cPush2 === 0 && push2.contains("synced 1 block(s)"), push2)

    // pull --from into a fresh workspace reproduces the dataset byte-for-byte
    val ws2 = Files.createTempDirectory("graft-cli-ws2-")
    val (cPull, pullOut) = runCli("--workspace", ws2.toString,
      "pull", "cities", "--from", remote.toUri.toString)
    assert(cPull === 0 && pullOut.startsWith("synced "), pullOut)
    val a = Dataset.open(spark, root.resolve("cities")).chain.blockHashes()
    val b = Dataset.open(spark, ws2.resolve("cities")).chain.blockHashes()
    assert(a === b)
    val (cTail, tailOut) = runCli("--workspace", ws2.toString, "tail", "cities", "5")
    assert(cTail === 0 && tailOut.contains("odessa"), tailOut)

    val (cRm, _) = runCli("--workspace", root.toString, "repo", "rm", "origin")
    assert(cRm === 0)
    val (_, listOut2) = runCli("--workspace", root.toString, "repo", "list")
    assert(listOut2.trim.isEmpty)
  }

  test("init / config / info: workspace marker, scoped config, consumers") {
    val root = Files.createTempDirectory("graft-cli-init-")
    val (c0, out0) = runCli("--workspace", root.toString, "init")
    assert(c0 === 0 && out0.contains("initialized"), out0)
    // re-init fails, --exists-ok tolerates
    val (c1, _) = runCli("--workspace", root.toString, "init")
    assert(c1 === 1)
    assert(runCli("--workspace", root.toString, "init", "--exists-ok")._1 === 0)

    // set / get / list / unset round-trip
    assert(runCli("--workspace", root.toString,
      "config", "set", "compact.maxSliceRecords", "2")._1 === 0)
    val (_, got) = runCli("--workspace", root.toString,
      "config", "get", "compact.maxSliceRecords")
    assert(got.trim === "2", got)
    val (_, listed) = runCli("--workspace", root.toString, "config", "list")
    assert(listed.contains("compact.maxSliceRecords=2")
      && listed.contains("workspace.version=1"), listed)

    // the config value actually drives compaction: 5 rows at max 2 → 3 slices
    val csv = root.resolve("n.csv")
    Files.writeString(csv, "id,v\n1,a\n2,b\n3,c\n4,d\n5,e\n")
    val ds = Dataset.create(spark, root.resolve("nums"), "nums")
    ds.chain.append(
      SetPollingSource(readFormat = "csv", schemaDdl = Some("id INT, v STRING"),
        merge = MergeConf("append")), 0L)
    IngestWriter.ingestFile(ds, csv.toString,
      java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli)
    val (cc, ccOut) = runCli("--workspace", root.toString, "compact", "nums")
    assert(cc === 0 && ccOut.trim.endsWith("-> 3"), ccOut)

    val (_, unsetOut) = runCli("--workspace", root.toString,
      "config", "set", "compact.maxSliceRecords")
    assert(unsetOut.contains("unset"), unsetOut)
    assert(runCli("--workspace", root.toString,
      "config", "get", "compact.maxSliceRecords")._2.contains("(unset)"))

    // a non-integer value for an integer key surfaces as a clean error
    runCli("--workspace", root.toString, "config", "set", "compact.maxSliceRecords", "soon")
    val (cBad, badOut) = runCli("--workspace", root.toString, "compact", "nums")
    assert(cBad === 1 && badOut.contains("must be an integer"), badOut)

    val (ci, infoOut) = runCli("--workspace", root.toString, "info")
    assert(ci === 0 && infoOut.contains(s"spark ${spark.version}")
      && infoOut.contains("1 datasets"), infoOut)
  }
}
