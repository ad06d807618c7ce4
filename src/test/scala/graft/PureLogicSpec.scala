package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.config.{StrategyParser, TableFilter}
import graft.model.FetchStrategy
import graft.state.{SyncStateStore, VersionHex}
import graft.sync.Extract

/** Driver-side logic: strategy parsing, glob filtering, state store, version
  * hex/bytes semantics, SQL template substitution. Mirrors the reference's
  * manual scenarios (TESTING_GUIDE.md:25-62, Optimization_Spec §15.2). */
class StrategyParserSpec extends AnyFunSuite {
  import StrategyParser._

  test("bare table name gets default record count") {
    val Right(o) = parseLine("CUSTTABLE", 1)
    assert(o.table == "CUSTTABLE")
    assert(o.strategy == FetchStrategy.TopNByKey(10000L))
  }

  test("explicit record count") {
    val Right(o) = parseLine("CUSTTABLE|5000", 1)
    assert(o.strategy == FetchStrategy.TopNByKey(5000L))
  }

  test("millions suffix 10m (CopyOrchestrator.cs:1765-1779)") {
    val Right(o) = parseLine("T|10m", 1)
    assert(o.strategy == FetchStrategy.TopNByKey(10000000L))
  }

  test("thousands suffix 3k") {
    val Right(o) = parseLine("T|3k", 1)
    assert(o.strategy == FetchStrategy.TopNByKey(3000L))
  }

  test("sql strategy with count") {
    val Right(o) = parseLine(
      "T|3000|sql:SELECT TOP (@recordCount) * FROM T WHERE X=0 ORDER BY RecId DESC", 1)
    o.strategy match {
      case FetchStrategy.CustomSql(sql, n, _) =>
        assert(n == 3000L); assert(sql.contains("@recordCount"))
      case other => fail(s"unexpected $other")
    }
  }

  test("-truncate flag") {
    val Right(o) = parseLine("T|5000 -truncate", 1)
    assert(o.strategy == FetchStrategy.TopNByKey(5000L, forceTruncate = true))
  }

  test("sql without * is an error") {
    assert(parseLine("T|sql:SELECT a FROM T", 3).isLeft)
  }

  test("zero record count is an error with line number") {
    val Left(e) = parseLine("T|0", 7)
    assert(e.line == 7)
  }

  test("garbage third segment is an error") {
    assert(parseLine("T|5000|garbage", 2).isLeft)
  }

  test("duplicate table names rejected (MainForm.cs:720-727)") {
    val Left(e) = parseAll("A|100\nB|200\na|300")
    assert(e.line == 3)
  }

  test("first error stops the run with its line number") {
    val Left(e) = parseAll("A|100\n\nB|bad\nC|1")
    assert(e.line == 3)
  }

  test("@sysRowVersionFilter gates optimized mode (CopyOrchestrator.cs:819-829)") {
    assert(StrategyParser.sqlSupportsOptimized(
      "SELECT * FROM T WHERE @sysRowVersionFilter ORDER BY RecId DESC"))
    assert(!StrategyParser.sqlSupportsOptimized("SELECT * FROM T"))
  }
}

class TableFilterSpec extends AnyFunSuite {
  import TableFilter._

  test("star-only glob, case-insensitive") {
    assert(matches("CUST*", "CustTable"))
    assert(matches("*", "ANYTHING"))
    assert(!matches("CUST*", "VENDTABLE"))
    assert(matches("*STAGING", "RETAILSTAGING"))
  }

  test("glob quotes regex metacharacters") {
    assert(matches("A.B*", "A.BC"))
    assert(!matches("A.B*", "AXBC")) // '.' is literal, not regex any
  }

  test("include-then-exclude order (Spec01:505-511)") {
    val names = Seq("CUSTTABLE", "CUSTSTAGING", "VENDTABLE", "SYSLOG")
    assert(filter(names, Seq("CUST*", "VEND*"), Seq("*STAGING")) ==
      Seq("CUSTTABLE", "VENDTABLE"))
  }

  test("empty include list passes nothing") {
    assert(filter(Seq("A"), Nil, Nil).isEmpty)
  }

  test("D365 name filter [A-Z0-9_] (Tier2DataService.cs:548-554)") {
    assert(isD365Name("CUSTTABLE_2"))
    assert(!isD365Name("sysdiagrams"))
    assert(!isD365Name("My-Table"))
  }

  test("copyable fields: intersection minus exclusions, source order, case-insensitive") {
    val src = Seq("RECID", "Name", "AMOUNT", "SECRET", "ONLYSRC")
    val tgt = Seq("recid", "NAME", "amount", "secret", "ONLYTGT")
    assert(copyableFields(src, tgt, Set("SECRET")) == Seq("RECID", "Name", "AMOUNT"))
  }

  test("field-exclusion map parse: global vs TABLE.FIELD (CopyOrchestrator.cs:1872-1911)") {
    val (global, perTable) = parseFieldExclusions(Seq("MEMO", "CUSTTABLE.CREDITMAX", "custtable.notes"))
    assert(global == Set("MEMO"))
    assert(perTable == Map("CUSTTABLE" -> Set("CREDITMAX", "NOTES")))
  }

  test("schema symmetric difference (CopyOrchestrator.cs:384-399)") {
    val (onlyA, onlyB) = schemaMismatch(Seq("A", "B"), Seq("b", "C"))
    assert(onlyA == Set("A")); assert(onlyB == Set("C"))
  }
}

class VersionHexSpec extends AnyFunSuite {
  // property-style over a seeded sample (plain scalacheck generators would
  // need the scalatestplus bridge, which isn't in the offline dep set)
  private val rnd = new scala.util.Random(42)
  private val samples: Seq[Long] =
    Seq(0L, 1L, -1L, Long.MaxValue, Long.MinValue, 0x00000000000012abL) ++
      Seq.fill(500)(rnd.nextLong())

  test("hex round trip for in-range versions (TimestampHelper.cs:37-64)") {
    samples.filter(_ >= 0L).foreach { v =>
      assert(VersionHex.parse(VersionHex.format(v)).contains(v))
    }
  }

  test("malformed hex degrades to None, not an exception") {
    assert(VersionHex.parse("garbage").isEmpty)
    assert(VersionHex.parse("0x12").isEmpty)
    assert(VersionHex.parse("0xZZZZZZZZZZZZZZZZ").isEmpty)
  }

  test("versions >= 2^63 degrade to None: signed-Long engine bound (VERDICT r1 #8)") {
    // the engine compares versions as signed LongType; a high-bit rowversion
    // would invert `>` — parse treats it like a corrupt mark so the table
    // falls back to a full standard sync instead of silently skipping changes
    samples.filter(_ < 0L).foreach { v =>
      assert(VersionHex.parse(VersionHex.format(v)).isEmpty, VersionHex.format(v))
    }
    // within the bound, signed compare == bytewise unsigned compare, so the
    // LongType engine is exactly the reference's BINARY(8) comparator
    for (a <- samples.filter(_ >= 0L).take(40); b <- samples.filter(_ >= 0L).take(40)) {
      assert(Integer.signum(java.lang.Long.compare(a, b)) == Integer.signum(
        VersionHex.compareBytes(VersionHex.toBytes(a), VersionHex.toBytes(b))))
    }
  }

  test("bytewise unsigned compare == unsigned numeric compare (TimestampHelper.cs:12-27)") {
    for (a <- samples.take(60); b <- samples.take(60)) {
      val byBytes = Integer.signum(
        VersionHex.compareBytes(VersionHex.toBytes(a), VersionHex.toBytes(b)))
      val byNum = Integer.signum(java.lang.Long.compareUnsigned(a, b))
      assert(byBytes == byNum, s"a=$a b=$b")
    }
  }

  test("byte round trip") {
    samples.foreach { v =>
      assert(VersionHex.fromBytes(VersionHex.toBytes(v)) == v)
    }
  }
}

class StateStoreSpec extends AnyFunSuite {
  test("put/get/persist round trip with atomic flush (D6)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_state")
    val path = s"$dir/state.json"
    val store = new SyncStateStore(path)
    store.putVersions("CUSTTABLE", 0x1234L, 0x99L, Some(42L))
    // a fresh store re-reads from disk — per-table crash safety
    val store2 = new SyncStateStore(path)
    val m = store2.get("custtable").get
    assert(m.sourceVersion.contains(0x1234L))
    assert(m.targetVersion.contains(0x99L))
    assert(m.maxRecId.contains(42L))
  }

  test("clear removes a table") {
    val path = java.nio.file.Files.createTempDirectory("graft_state").toString + "/s.json"
    val store = new SyncStateStore(path)
    store.putVersions("A", 1L, 2L, None)
    store.putVersions("B", 3L, 4L, None)
    store.clear("a")
    assert(new SyncStateStore(path).allTables == Set("B"))
  }

  test("corrupt stored hex yields None (degrade-to-standard ladder)") {
    val path = java.nio.file.Files.createTempDirectory("graft_state").toString + "/s.json"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), """{"T":{"src":"0xNOTHEX0000000000","maxRecId":5}}""")
    val m = new SyncStateStore(path).get("T").get
    assert(m.sourceVersion.isEmpty)
    assert(m.maxRecId.contains(5L))
  }
}

class ExtractTemplateSpec extends AnyFunSuite {
  test("SELECT * substitution with field list") {
    val out = Extract.substituteTemplate(
      "SELECT TOP (@recordCount) * FROM T WHERE @sysRowVersionFilter",
      Seq("RecId", "Name"), 5000, None)
    assert(out == "SELECT TOP (5000) RecId, Name FROM T WHERE (1=1)")
  }

  test("COUNT(*) and arithmetic * survive (documented deviation, SURVEY §7.3.5)") {
    val out = Extract.substituteTemplate(
      "SELECT * FROM (SELECT COUNT(*) c, a*b p FROM T) x",
      Seq("c", "p"), 10, None)
    assert(out.contains("COUNT(*)"))
    assert(out.contains("a*b"))
    assert(out.startsWith("SELECT c, p FROM"))
  }

  test("version filter placeholder substitution") {
    val out = Extract.substituteTemplate(
      "SELECT * FROM T WHERE @sysRowVersionFilter",
      Seq("A"), 1, Some("SysRowVersion >= 0x0abc"))
    assert(out.endsWith("WHERE SysRowVersion >= 0x0abc"))
  }
}

class PushdownSqlSpec extends AnyFunSuite {
  import graft.jdbc.PushdownSql._

  test("golden: top-N fetch (Get SQL parity, MainForm.cs:1149-1339)") {
    assert(topNFetch("CUSTTABLE", Seq("RECID", "NAME"), 10000) ==
      "SELECT TOP (10000) [RECID], [NAME] FROM [CUSTTABLE] ORDER BY RecId DESC")
  }

  test("golden: control fetch") {
    assert(controlFetch("T", 500) ==
      "SELECT TOP (500) [RecId], [SysRowVersion] FROM [T] ORDER BY RecId DESC")
  }

  test("golden: delta fetch with >= over-fetch semantics") {
    val sql = deltaFetch("T", Seq("RECID"), 100, "0x00000000000012ab", 7)
    assert(sql == "SELECT TOP (100) [RECID] FROM [T] " +
      "WHERE SysRowVersion >= 0x00000000000012ab AND RecId >= 7 ORDER BY RecId DESC")
  }

  test("golden: three staged deletes (AxDbDataService.cs:1129-1173)") {
    val ds = stagedDeletes("T", "#Tier2Control", "0x01", "0x02")
    assert(ds.size == 3)
    assert(ds(0).contains("SysRowVersion > 0x01"))
    assert(ds(1).contains("t.SysRowVersion > 0x02"))
    assert(ds(2).contains("NOT EXISTS"))
  }

  test("batched key deletes split at 5000 (AxDbDataService.cs:11)") {
    val ds = batchedKeyDeletes("T", (1L to 12000L).toSeq)
    assert(ds.size == 3)
    assert(ds(0).contains("(1, "))
  }

  test("sequence bump +10000 (AxDbDataService.cs:12)") {
    assert(sequenceBump(123, 5000) == "ALTER SEQUENCE [SEQ_123] RESTART WITH 15000")
  }

  test("golden: trigger guard DDL + 120s toggle timeout (AxDbDataService.cs:122,316, :14-17)") {
    assert(disableTriggers("CUSTTABLE") == "ALTER TABLE [CUSTTABLE] DISABLE TRIGGER ALL")
    assert(enableTriggers("CUSTTABLE") == "ALTER TABLE [CUSTTABLE] ENABLE TRIGGER ALL")
    assert(TriggerCommandTimeoutSeconds == 120)
  }

  test("golden: transactional incremental apply script ordering (D5, CopyOrchestrator.cs:1053-1232)") {
    val s = incrementalApplyScript("T", "#ctl", "#data", "0x01", "0x02",
      tableId = 9, maxRecId = 100, fields = Seq("RECID", "NAME"))
    assert(s.head == "BEGIN TRANSACTION" && s.last == "COMMIT TRANSACTION")
    // triggers off BEFORE any delete, on AFTER the sequence bump, inside txn
    assert(s.indexOf(disableTriggers("T")) == 1)
    assert(s.indexWhere(_.startsWith("DELETE")) == 2)
    assert(s.indexWhere(_.startsWith("INSERT INTO [T]")) == 5)
    assert(s.indexOf(sequenceBump(9, 100)) == 6)
    assert(s.indexOf(enableTriggers("T")) == s.size - 2)
    // rollback path re-enables triggers AFTER the rollback (finally-block
    // ordering: an in-transaction re-enable would be undone)
    assert(rollbackScript("T") ==
      Seq("ROLLBACK TRANSACTION", "ALTER TABLE [T] ENABLE TRIGGER ALL"))
  }

  test("golden: changeset apply script (staged keys + insert-select)") {
    val s = changeSetApplyScript("T", "##k", "##d", 9, 100, Seq("RECID"))
    assert(s == Seq(
      "BEGIN TRANSACTION",
      "ALTER TABLE [T] DISABLE TRIGGER ALL",
      "DELETE t FROM [T] t WHERE EXISTS (SELECT 1 FROM [##k] k WHERE k.RecId = t.RecId)",
      "INSERT INTO [T] ([RECID]) SELECT [RECID] FROM [##d]",
      "ALTER SEQUENCE [SEQ_9] RESTART WITH 10100",
      "ALTER TABLE [T] ENABLE TRIGGER ALL",
      "COMMIT TRANSACTION"))
  }

  test("control staging DDL (S14, AxDbDataService.cs:1185-1212)") {
    assert(controlStagingDdl("#Tier2Control") ==
      "CREATE TABLE [#Tier2Control] (RecId BIGINT NOT NULL PRIMARY KEY, SysRowVersion BINARY(8) NOT NULL)")
  }
}

class ApplierSeamSpec extends AnyFunSuite {
  import graft.run.{JdbcApplier, LakeApplier}
  import graft.jdbc.Jdbc

  test("JdbcApplier emits the golden transactional scripts (compile + text check; no server here)") {
    val app = JdbcApplier(
      Jdbc.JdbcConfig("jdbc:sqlserver://host", "sa", "pw"),
      table = "CUSTTABLE", tableId = 7, fields = Seq("RECID", "NAME"),
      sourceMark = 0x12abL, targetMark = 0x34L)
    val s = app.applyScript(maxRecId = 500)
    assert(s.head == "BEGIN TRANSACTION" && s.last == "COMMIT TRANSACTION")
    assert(s.exists(_.contains("##graft_CUSTTABLE_keys")))
    assert(s.exists(_.contains("SEQ_7")))
    val c = app.controlApplyScript(maxRecId = 500)
    assert(c.exists(_.contains("SysRowVersion > 0x00000000000012ab")))
    assert(c.exists(_.contains("t.SysRowVersion > 0x0000000000000034")))
    assert(app.onErrorScript.head == "ROLLBACK TRANSACTION")
    // full-width target read: a key+version-only read would make the
    // bootstrap standard sync overwrite the table with a payload-less frame
    assert(graft.jdbc.PushdownSql.fullFetch("CUSTTABLE", Seq("RECID", "NAME")) ==
      "SELECT [RECID], [NAME] FROM [CUSTTABLE]")
    // staging hygiene is idempotent and covers both staging tables
    assert(app.stagingResetScript == Seq(
      "IF OBJECT_ID('tempdb..##graft_CUSTTABLE_keys') IS NOT NULL DROP TABLE [##graft_CUSTTABLE_keys]",
      "IF OBJECT_ID('tempdb..##graft_CUSTTABLE_data') IS NOT NULL DROP TABLE [##graft_CUSTTABLE_data]"))
    // sequence bump input is computed from the staged rows, server-side
    assert(graft.jdbc.PushdownSql.stagedMaxKeySql("##graft_CUSTTABLE_data", "RecId") ==
      "SELECT COALESCE(MAX([RecId]), 0) FROM [##graft_CUSTTABLE_data]")
  }

  test("LakeApplier implements the applier contract over LakeTable") {
    val app = LakeApplier(
      java.nio.file.Files.createTempDirectory("graft_seam").toString + "/t")
    assert(!app.exists)
  }
}
