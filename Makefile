.PHONY: install test bench docs

install:
	pip install -e .

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

docs:
	@echo "docs are plain markdown under docs/"
