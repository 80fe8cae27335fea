package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The FuzzyMatchPruning optimizer rule: naive `levenshtein(a,b) <= d`
  * predicates must come out length-pruned + thresholded, with row
  * results unchanged (nulls included) and the rewrite stable under the
  * optimizer's fixpoint execution. */
class FuzzyMatchPruningSpec extends AnyFunSuite {

  private def withExtSession[T](f: SparkSession => T): T = {
    val prevActive = SparkSession.getActiveSession
    val prevDefault = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val spark = SparkSession.builder()
        .master("local[2]")
        .appName("graft-fuzzy-rule-test")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        // keep filters over VALUES visible in the optimized plan —
        // ConvertToLocalRelation would fold them before we can assert
        .config("spark.sql.optimizer.excludedRules",
          "org.apache.spark.sql.catalyst.optimizer.ConvertToLocalRelation")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      f(spark)
    } finally {
      prevActive.foreach(SparkSession.setActiveSession)
      prevDefault.foreach(SparkSession.setDefaultSession)
    }
  }

  private val rows =
    "VALUES ('kitten','sitting'), ('abc','abd'), ('abc','abc'), " +
      "('x', NULL), (NULL, NULL), ('short','muchlongerstring') t(a, b)"

  test("filter predicate is rewritten once: length prune + banded DP") {
    withExtSession { spark =>
      val df = spark.sql(s"SELECT * FROM $rows WHERE levenshtein(a, b) <= 2")
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("levenshtein(a"), s"kernel kept:\n$plan")
      assert(plan.contains("Some(2)) >= 0"), s"threshold threaded:\n$plan")
      assert("abs\\(".r.findAllIn(plan).size === 1,
        s"exactly one length-prune conjunct (idempotence):\n$plan")
      // rows unchanged vs the naive evaluation semantics
      val got = df.collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(got === Set(("abc", "abd"), ("abc", "abc")))
    }
  }

  test("strict <, and reversed literal-first forms rewrite too") {
    withExtSession { spark =>
      val lt = spark.sql(s"SELECT * FROM $rows WHERE levenshtein(a, b) < 3")
        .queryExecution.optimizedPlan.toString
      assert(lt.contains("Some(2)) >= 0"), s"< 3 becomes threshold 2:\n$lt")
      val rev = spark.sql(s"SELECT * FROM $rows WHERE 2 >= levenshtein(a, b)")
        .queryExecution.optimizedPlan.toString
      assert(rev.contains("Some(2)) >= 0"), s"reversed form:\n$rev")
    }
  }

  test("join conditions get the same rewrite") {
    withExtSession { spark =>
      val df = spark.sql(
        """SELECT * FROM VALUES ('abc'), ('xyz') l(a)
           JOIN VALUES ('abd'), ('qqq') r(b)
           ON levenshtein(a, b) <= 1""")
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("Some(1)) >= 0"), s"join condition rewritten:\n$plan")
      val got = df.collect().map(r => (r.getString(0), r.getString(1)))
      assert(got.toSeq === Seq(("abc", "abd")))
    }
  }

  test("bigint literal and foldable-expression thresholds rewrite too") {
    withExtSession { spark =>
      // `<= 3L` analyzes as cast(lev AS bigint) <= 3L — the benign cast
      // is stripped and the bound still reaches the banded kernel
      val big = spark.sql(
        s"SELECT * FROM $rows WHERE levenshtein(a, b) <= CAST(2 AS BIGINT)")
      val bigPlan = big.queryExecution.optimizedPlan.toString
      assert(bigPlan.contains("Some(2)) >= 0"), s"bigint bound threaded:\n$bigPlan")
      assert(big.collect().map(r => (r.getString(0), r.getString(1))).toSet
        === Set(("abc", "abd"), ("abc", "abc")))
      // a constant arithmetic bound folds and rewrites the same way
      val fold = spark.sql(s"SELECT * FROM $rows WHERE levenshtein(a, b) <= 1 + 1")
        .queryExecution.optimizedPlan.toString
      assert(fold.contains("Some(2)) >= 0"), s"foldable bound threaded:\n$fold")
    }
  }

  test("already-thresholded and unbounded-value uses are left alone") {
    withExtSession { spark =>
      // projection (no predicate): untouched
      val proj = spark.sql(s"SELECT levenshtein(a, b) AS d FROM $rows")
        .queryExecution.optimizedPlan.toString
      assert(!proj.contains("abs("), s"projection untouched:\n$proj")
      // user already passed a threshold: not double-wrapped
      val thr = spark.sql(
        s"SELECT * FROM $rows WHERE levenshtein(a, b, 5) <= 2")
        .queryExecution.optimizedPlan.toString
      assert(!thr.contains("abs("), s"thresholded form untouched:\n$thr")
    }
  }
}
