"""Round-13 corpus-governance and release-audit walkthrough, end to end
on the synthetic tables:

1. WHO holds the corpus? — Gini + HHI concentration of customer spend
   within each nation (the long-tail audit: is 1% of sources most of
   the tokens?);
2. how do we SPLIT the budget? — largest-remainder apportionment of a
   1M-document sampling budget across (lang, source) strata, summing
   to exactly 1M by construction;
3. how much vocabulary is UNSEEN? — bias-corrected Chao1 and the
   Good-Turing unseen mass from the token frequency-of-frequencies;
4. did the copy ARRIVE intact? — order-invariant table checksum of
   lineitem per return flag (re-partitioned/re-ordered copies hash
   equal iff the rows are equal);
5. where is the WEIGHTED tail? — quantity-weighted exact price
   quantiles (the p90 unit is not the p90 line);
6. is the trend REAL? — Mann-Kendall significance on the daily spend
   series, next to q174's Theil-Sen slope;
7. are these two columns ENTANGLED? — Cramér's V association headline
   over the q139 chi-square cell frame.

Run: python examples/governance_audit.py [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

from snowplow_s3_loader_spark.session import get_spark
from snowplow_s3_loader_spark.plans import queries as q


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="governance-audit")

    print("== spend concentration per nation (Gini / HHI) ==")
    q.q179_gini(spark, sf_dir).orderBy(F.desc("gini_micro")).show(5)

    print("== exact-total sampling allocation (1M slots) ==")
    alloc = q.q184_sample_allocation(spark, sf_dir)
    alloc.orderBy(F.desc("alloc")).show(5)
    total = alloc.agg(F.sum("alloc")).collect()[0][0]
    print(f"   allocations sum to exactly {total:,}")

    print("== vocabulary richness (Chao1 / Good-Turing) ==")
    q.q185_vocab_richness(spark, sf_dir).show()

    print("== order-invariant lineitem checksum per return flag ==")
    q.q182_table_checksum(spark, sf_dir).show()

    print("== quantity-weighted price quantiles ==")
    q.q183_weighted_quantiles(spark, sf_dir).show(8)

    print("== Mann-Kendall trend significance (daily spend) ==")
    q.q180_mann_kendall(spark, sf_dir).show()

    print("== Cramer's V: event type x user cohort ==")
    q.q181_cramers_v(spark, sf_dir).show()

    spark.stop()


if __name__ == "__main__":
    main()
