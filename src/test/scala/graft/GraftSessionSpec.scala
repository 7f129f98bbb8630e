package graft

/** The one-call session factory must yield a session where the whole
  * library surface works without further setup: extensions (pushdown
  * rule, TopK strategy, SQL functions) and the corpus reader contract.
  *
  * Suites share one JVM-wide SparkSession, so this spec neither stops
  * the session it gets nor diverges from SparkTestBase's master/
  * partition settings — whichever suite runs first, both see a session
  * with identical semantics (GraftSession.configure sets exactly the
  * confs SparkTestBase pins).
  */
class GraftSessionSpec extends SparkTestBase {

  test("GraftSession.configure sets every library conf on the builder") {
    // Order-independent check of configure() itself: when another suite
    // has already created the JVM-wide session, getOrCreate ignores
    // static confs and the runtime ones coincide with SparkTestBase's —
    // so the wired-session test below can't catch a configure()
    // regression. Read the builder's accumulated options directly.
    val b = GraftSession.builder()
    // the options map lives on the SparkSessionBuilder parent class
    val f = Iterator.iterate[Class[_]](b.getClass)(_.getSuperclass)
      .takeWhile(_ != null)
      .flatMap(_.getDeclaredFields)
      .find(_.getName.contains("options"))
      .getOrElse(fail("SparkSession.Builder options field not found"))
    f.setAccessible(true)
    val opts = f.get(b).asInstanceOf[scala.collection.mutable.Map[String, String]]
    assert(opts.get("spark.sql.extensions")
      .contains("graft.plans.GraftExtensions"))
    assert(opts.get("spark.sql.session.timeZone").contains("UTC"))
    assert(opts.get("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
    assert(opts.get("spark.sql.parquet.inferTimestampNTZ.enabled")
      .contains("false"))
  }

  test("GraftSession-configured getOrCreate yields a fully-wired session") {
    val spark = GraftSession.configure(
      org.apache.spark.sql.SparkSession.builder()
        .master("local[4,2]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.warehouse.dir",
          s"/tmp/graft_warehouse_${sys.props.getOrElse("user.name", "u")}")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    assert(spark.conf.get("spark.sql.session.timeZone") == "UTC")
    assert(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true")
    assert(spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled") == "false")
    // injected SQL function resolves (GraftFunctions.inject via extensions)
    val m = spark.sql("SELECT term_counts(array('a','a','b')) tc").head()
      .getMap[String, Long](0)
    assert(m == Map("a" -> 2L, "b" -> 1L))
    // the TopK strategy plans the custom operator
    import org.apache.spark.sql.functions.{col, length}
    val docs = Tables.documents(spark, sf)
    val plan = graft.plans.GraftPlans.topKPerKey(
      docs.select(col("doc_id"), col("lang"), length(col("text")).as("n")),
      Seq("lang"), Seq("n" -> false, "doc_id" -> true), 3)
    assert(plan.queryExecution.executedPlan.toString.contains("TopKPerKey"),
      plan.queryExecution.executedPlan.toString)
    assert(plan.count() > 0)
  }
}
