"""PySpark-native batch-processing analytics engine.

A from-scratch re-expression of the capabilities of the Axeda Connexion 2012
"Simple Batch Processing Framework" (reference: /root/reference,
artisan-starter-scripts/src/main/groovy/*.groovy) as declarative, scale-out
Spark DataFrame operators, plus the LLM-training-data pipeline operators
(dedup, similarity search, text analysis, multimodal columns) a 100 TB
deployment needs.

Import shorthand::

    import connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark as cx
"""

__version__ = "0.1.0"
