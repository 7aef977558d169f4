from diepy_spark.plans.relational import RELATIONAL_QUERIES  # noqa: F401
from diepy_spark.plans.oracles import RELATIONAL_ORACLES  # noqa: F401
