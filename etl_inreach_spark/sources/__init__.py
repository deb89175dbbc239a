"""Sources: KML parsing and the HTTP feed data source."""
