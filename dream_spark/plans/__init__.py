from dream_spark.plans.sparql import Condition, ParsedQuery, parse_sparql
from dream_spark.plans.stats import TripleStats
from dream_spark.plans.translator import translate

__all__ = ["Condition", "ParsedQuery", "parse_sparql", "TripleStats", "translate"]
