"""Composable query plans: ContextualFilter / TaxonomyFilter builders."""

from bpaotu_spark.plans.filters import ContextualFilter, Pred
from bpaotu_spark.plans.taxonomy import RankFix, TaxonomyFilter, drilldown_options

__all__ = ["ContextualFilter", "Pred", "RankFix", "TaxonomyFilter", "drilldown_options"]
