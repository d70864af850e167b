"""`python -m ml_audio_restoration_tpu` == the `mlar-tpu` console script.

The reference is driven as bare scripts (python src/inference.py ...,
/root/reference/README.md); a checkout of this package gets the same
no-install invocation via -m, sharing cli.main with the installed
entry point (pyproject.toml [project.scripts])."""
from .cli import main

if __name__ == "__main__":
    main()
