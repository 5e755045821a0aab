"""WIDER FACE evaluation: AP Easy/Medium/Hard + flip/multi-scale TTA
(SURVEY.md §2 C11, §3.3)."""
