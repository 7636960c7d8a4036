package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded edit-distance (Levenshtein) self-join via positional q-gram
  * count filtering — the record-linkage workhorse for catalog/vocabulary
  * typo detection (reference: the kind of name matching
  * covid-19-data-engineering's loaders do implicitly by normalizing
  * table names, generalized to approximate string matching).
  *
  * Candidate generation uses the classic q-gram lower bound: one edit
  * operation destroys at most q of a string's overlapping q-grams, so
  * lev(a,b) ≤ k implies multiset-gram overlap ≥ max(|a|,|b|) − (q−1) − q·k.
  * Pairs are generated from an inverted gram→string index (shuffle keyed
  * on the gram, exactly the q136 prefix-join shape), count-filtered by
  * that bound plus the |len(a)−len(b)| ≤ k length filter, and only the
  * survivors pay the O(|a|·|b|) verify. Strings too short for the bound
  * to bite (max(|a|,|b|) ≤ q·k+1, where the threshold is ≤ 0) are
  * cross-paired in a separate short bucket — by construction a bounded
  * set, since there are at most |Σ|^(q·k+1) such strings.
  *
  * Scale posture: gram postings carry (string, count), so the self-join
  * cost is Σ df² over gram frequencies — skew-prone on common grams
  * exactly like q145's term postings, and the same mitigation applies
  * (drop each string's most frequent grams first if needed; not done
  * here because the verify stays lossless only with the full multiset
  * bound). Everything shuffles on gram or string keys; nothing collects.
  */
object EditDistanceJoin {

  /** All unordered pairs of distinct non-null `strCol` values with
    * levenshtein ≤ k. Returns (name_a, name_b, dist), name_a < name_b.
    */
  def selfJoin(df: DataFrame, strCol: String, k: Int, q: Int = 2): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(q >= 2, s"q must be >= 2, got $q")
    val names = df.select(col(strCol).as("s"))
      .filter(col("s").isNotNull).distinct()
      .withColumn("len", length(col("s")))
    val shortMax = q * k + 1
    // Inverted index path: strings long enough that the gram bound can
    // prune (len >= q guarantees at least one gram exists).
    val longNames = names.filter(col("len") >= q)
    val grams = longNames.select(col("s"), col("len"),
        explode(expr(
          s"transform(sequence(1, length(s) - ${q - 1}), i -> substring(s, i, $q))"))
          .as("g"))
      .groupBy(col("s"), col("len"), col("g")).agg(count(lit(1)).as("c"))
    val cand = grams.select(col("s").as("sa"), col("len").as("la"),
        col("g"), col("c").as("ca"))
      .join(grams.select(col("s").as("sb"), col("len").as("lb"),
        col("g"), col("c").as("cb")), "g")
      .filter(col("sa") < col("sb") &&
        abs(col("la") - col("lb")) <= k)
      .groupBy(col("sa"), col("sb"), col("la"), col("lb"))
      .agg(sum(least(col("ca"), col("cb"))).as("common"))
      .filter(
        // bound vacuous for short pairs — they ride the short bucket
        greatest(col("la"), col("lb")) > shortMax &&
        col("common") >= greatest(col("la"), col("lb")) - (q - 1) - q * k)
      .select(col("sa"), col("sb"))
    // Short bucket: pairs where max(len) <= q*k+1 can be within k edits
    // while sharing zero grams, so they bypass the index entirely.
    val short = names.filter(col("len") <= shortMax)
    val shortPairs = short.select(col("s").as("sa"), col("len").as("la"))
      .crossJoin(short.select(col("s").as("sb"), col("len").as("lb")))
      .filter(col("sa") < col("sb") && abs(col("la") - col("lb")) <= k)
      .select(col("sa"), col("sb"))
    // A long/short mixed pair has max(len) > q*k+1, so it is covered by
    // the index path; union + distinct dedupes the boundary overlap.
    cand.unionByName(shortPairs).distinct()
      .filter(levenshtein(col("sa"), col("sb")) <= k)
      .select(col("sa").as("name_a"), col("sb").as("name_b"),
        levenshtein(col("sa"), col("sb")).as("dist"))
  }
}
