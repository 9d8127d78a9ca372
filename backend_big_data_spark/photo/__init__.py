"""Photo-domain layer: the reference's complete capability surface
(SURVEY.md §1-2) over the corrected photo schema.

- ``schema``  — the 45-leaf-field photo StructType with the §1.3 tags fix
- ``queries`` — the 22 relational query functions (§2, bugs §2.13 fixed)
- ``ml``      — KMeans ×2 and FPGrowth tag rules (§2.10)
- ``api``     — the 27 endpoint semantics incl. driver-side shaping (§2.12)
"""
