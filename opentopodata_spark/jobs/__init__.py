"""spark-submit job entry points.

Cluster invocation (north-rule contract — BASELINE.json):

    python -m opentopodata_spark.jobs.package --out /tmp/otds.zip
    spark-submit --master <cluster> --py-files /tmp/otds.zip \
        $(python -c 'import opentopodata_spark.jobs.elevation as m; print(m.__file__)') \
        --master external --documents s3://…/docs --config config.yaml \
        --datasets multi --out s3://…/results

Local invocation (same code path, what the sandbox tests exercise):

    python -m opentopodata_spark.jobs.elevation --documents … --out …
"""
