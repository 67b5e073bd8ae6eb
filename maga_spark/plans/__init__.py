"""Plans: the epoch-loop crawl frontier engine and the snapshot store."""
