package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.analysis.SimpleFunctionRegistry
import org.scalatest.funsuite.AnyFunSuite

/** The `spark.sql.extensions` injection path: GraftExtensions must
  * place every builder into a FunctionRegistry the way session
  * bootstrap does (`SparkSessionExtensions.registerFunctions` is the
  * exact hook BaseSessionStateBuilder calls), and the injected
  * builders must produce working expressions. */
class GraftExtensionsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("extension injects every builder into a fresh function registry") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val registry = org.apache.spark.sql.graft.ExtensionsTestBridge
      .registerInto(ext, new SimpleFunctionRegistry)
    val names = org.apache.spark.sql.graft.GraftFunctions.builders.map(_._1)
    names.foreach { n =>
      assert(registry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(n)),
        s"function $n not injected")
    }
  }

  test("injected builders resolve and evaluate through spark.sql") {
    // register through the extension-built registry path into the live
    // session, then evaluate one function of each builder flavor
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    org.apache.spark.sql.graft.ExtensionsTestBridge
      .registerInto(ext, spark.sessionState.functionRegistry)
    val row = spark.sql(
      """SELECT vector_dot(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS dot,
                token_count('a b  c') AS tc,
                sorted_intersect_size(array(1, 2, 5), array(2, 5, 9)) AS si,
                image_meta(CAST('not an image' AS BINARY)) AS im,
                audio_meta(CAST('not audio' AS BINARY)) AS am,
                bpe_encode('join the scan') AS bpe
      """).head()
    assert(row.getDouble(0) == 11.0)
    assert(row.getInt(1) == 3)
    assert(row.getInt(2) == 2)
    assert(row.isNullAt(3) && row.isNullAt(4))
    // matches Bpe.encodeKernel over the frozen table
    assert(row.getString(5) ==
      "|join|| ||t||h||e|| ||scan|")
  }
}
