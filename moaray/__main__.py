from .cli import main_cmd

raise SystemExit(main_cmd())
