"""ocr_translation_spark — a PySpark-native document-extraction engine.

A from-scratch rewrite of the capabilities of the reference pipeline
(hairbui76/ocr-translation: OCR -> translate -> PDF re-layout, chained
through Redis/BullMQ queues with content-hash caching) as a batch Spark
job over tables of interleaved text+media documents:

    documents(doc_id: string,
              spans: array<struct<kind:string, text:string,
                                  media_ref:string, offset:int>>)

Three stages (reference parity, see SURVEY.md section 2):
  A. OCR / layout parse   (reference src/utils/ocr.js:13-17)
  B. boilerplate strip    (validation guards, reference src/utils/pdf.js:14-22,
                           generalized to DOM/boilerplate heuristics)
  C. dictionary+rule translation (reference src/utils/translator.js:8-23)

The per-row invariant vs the reference semantics is span-sequence
equality on (kind, text, media_ref, order); the golden spec is the
pure-Python single-document implementation in ``semantics.py``
(the analogue of reference index.js:5-16).
"""

__version__ = "0.1.0"
