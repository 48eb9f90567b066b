package graft

import java.nio.file.Files

/** Pins the spread gate's input-size probe (Tables.inputBytes): it must
  * resolve sizes through the Hadoop FileSystem API, not string-stripped
  * java.io paths — the old probe returned 0 for URL-encoded local URIs
  * (and any non-local scheme), silently disabling the §2.5 spread on
  * exactly the single-split inputs it exists for. */
class TablesSpreadSpec extends SparkSpec {

  test("inputBytes resolves URL-encoded file: URIs the old probe sized to 0") {
    val dir = Files.createTempDirectory("spread-probe").toFile
    dir.deleteOnExit()
    val f = new java.io.File(dir, "a b.parquet") // space → %20 in the URI
    Files.write(f.toPath, Array.fill[Byte](1234)(7))
    f.deleteOnExit()
    val uri = f.toURI.toString
    assert(uri.contains("%20"), s"expected an encoded space in $uri")
    assert(Tables.inputBytes(spark, Seq(uri)) == 1234L)
    // the old string-strip probe sized this same URI to 0 (no such file
    // named "...a%20b.parquet")
    assert(new java.io.File(uri.stripPrefix("file:")).length() == 0L)
  }

  test("inputBytes fails closed (0 bytes → no spread) on an unresolvable scheme") {
    assert(Tables.inputBytes(spark, Seq("nosuchfs://host/t/x.parquet")) == 0L)
  }
}
