// SqlQuery - mirror of pages/SqlQuery.tsx: example-query chips, saved
// queries (named via prompt), SQL editor, run/save/clear actions, and a
// paginated result table with NULL/object formatting.

import { h, pageHeader, snackbar, codeEditor, dataTable } from "/assets/ui.js";
import { queryApi } from "/assets/api.js";

const EXAMPLE_QUERIES = [
  {
    name: "Recent Events",
    query:
      "SELECT r.id, r.timestamp, r.source_path, r.payload, t.success, t.response_code \nFROM raw_events r \nLEFT JOIN transformed_events t ON r.id = t.raw_event_id \nORDER BY r.timestamp DESC \nLIMIT 10",
  },
  {
    name: "Success Rate by Webhook",
    query:
      "SELECT w.source_path, COUNT(t.id) as total, SUM(CASE WHEN t.success THEN 1 ELSE 0 END) as success_count, \nCAST(SUM(CASE WHEN t.success THEN 1 ELSE 0 END) AS FLOAT) / COUNT(t.id) as success_rate \nFROM webhooks w \nJOIN transformed_events t ON w.id = t.webhook_id \nGROUP BY w.source_path",
  },
  {
    name: "Failed Events",
    query:
      "SELECT r.id, r.timestamp, r.source_path, t.response_code, t.response_body \nFROM raw_events r \nJOIN transformed_events t ON r.id = t.raw_event_id \nWHERE t.success = FALSE \nORDER BY r.timestamp DESC \nLIMIT 10",
  },
  {
    name: "Event Types",
    query:
      "SELECT json_extract(r.payload, '$.type') as event_type, COUNT(*) as count \nFROM raw_events r \nGROUP BY event_type \nORDER BY count DESC",
  },
];

export function SqlQuery(main) {
  const state = { query: "SELECT * FROM webhooks LIMIT 10", saved: [] };
  const results = h("div");
  const errorBox = h("div");

  const editor = codeEditor({
    value: state.query,
    height: "220px",
    language: "sql",
    onChange: (v) => (state.query = v),
  });

  const loadQuery = (q) => {
    state.query = q;
    editor.value = q;
    results.replaceChildren();
    errorBox.replaceChildren();
  };

  const chipsRow = h("div", { style: "display:flex;flex-wrap:wrap;gap:8px;margin-bottom:14px" });
  const renderChips = () => {
    chipsRow.replaceChildren(
      ...EXAMPLE_QUERIES.map((ex) =>
        h("span", { class: "chip clickable", onclick: () => loadQuery(ex.query) }, ex.name),
      ),
      ...state.saved.map((s) =>
        h("span", { class: "chip outlined clickable", onclick: () => loadQuery(s.query) }, s.name),
      ),
    );
  };
  renderChips();

  const runBtn = h(
    "button",
    {
      class: "btn-contained",
      onclick: async () => {
        if (!state.query.trim()) return snackbar("Please enter a SQL query", "error");
        runBtn.disabled = true;
        runBtn.textContent = "Running...";
        results.replaceChildren();
        errorBox.replaceChildren();
        try {
          const res = await queryApi.executeQuery(state.query);
          // the gateway returns {status, columns, result}; the reference
          // UI's {columns, rows} shape is tolerated too
          res.rows = res.result ?? res.rows ?? [];
          const columns = (res.columns || []).map((c) => ({
            id: c,
            label: c,
            format: (v) => (v === null ? "NULL" : typeof v === "object" ? JSON.stringify(v) : String(v)),
          }));
          const rows = (res.rows || []).map((r) => {
            const o = {};
            (res.columns || []).forEach((c, i) => (o[c] = r[i]));
            return o;
          });
          results.replaceChildren(
            h(
              "div",
              { class: "paper" },
              h(
                "div",
                { class: "row-between", style: "margin-bottom:12px" },
                h("h3", {}, "Query Results"),
                h("span", { class: "muted" }, `${rows.length} rows returned`),
              ),
              dataTable({ columns, rows }),
            ),
          );
          snackbar("Query executed successfully", "success");
        } catch (e) {
          errorBox.replaceChildren(h("div", { class: "alert error" }, e.message));
          snackbar("Query execution failed", "error");
        } finally {
          runBtn.disabled = false;
          runBtn.textContent = "▶ Run Query";
        }
      },
    },
    "▶ Run Query",
  );

  main.append(
    pageHeader({ title: "SQL Query" }),
    h(
      "div",
      { class: "card" },
      h("h3", {}, "Run SQL Queries"),
      h("p", { class: "muted" }, "Execute arbitrary SQL queries against the webhook gateway database."),
      h("h3", { style: "font-size:14px" }, "Example Queries"),
      chipsRow,
      editor,
      h(
        "div",
        { class: "right", style: "margin-top:14px" },
        h(
          "button",
          {
            class: "btn-outlined",
            style: "color:var(--text2);border-color:#9e9e9e",
            onclick: () => loadQuery(""),
          },
          "✕ Clear",
        ),
        h(
          "button",
          {
            class: "btn-outlined",
            onclick: () => {
              const name = prompt("Enter a name for this query:");
              if (name && state.query.trim()) {
                state.saved.push({ name, query: state.query });
                renderChips();
                snackbar("Query saved", "success");
              }
            },
          },
          "💾 Save Query",
        ),
        runBtn,
      ),
    ),
    errorBox,
    results,
  );
}
