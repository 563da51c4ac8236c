from stats_spark.datagen import dims, corpus  # noqa: F401
